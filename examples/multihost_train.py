"""Multi-host distributed training demo: N processes join one
jax.distributed cluster and run a tp-sharded + dp-batched train step
whose gradient all-reduce crosses process boundaries (DCN on a real
pod; Gloo cross-process collectives on CPU).

Reference: the reference has NO distributed execution (SURVEY §2.6) —
this is the net-new DCN story built on `parallel.mesh.distributed_init`
and `multihost_mesh`.

Run (launcher — spawns both workers on this machine over localhost):
    python examples/multihost_train.py --smoke
Real pod (one command per host):
    python examples/multihost_train.py --worker \
        --coordinator host0:9876 --num-processes 2 --process-id <i>
"""

import argparse
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(coordinator, num_processes, process_id, local_devices):
    if local_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_devices}")
    import jax

    if local_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tensor_tpu.parallel.mesh import (distributed_init,
                                                  multihost_mesh)

    distributed_init(coordinator=coordinator, num_processes=num_processes,
                     process_id=process_id)
    mesh = multihost_mesh(sp=1, tp=2)
    if process_id == 0:
        print(f"global devices: {len(jax.devices())}  mesh: "
              f"{dict(mesh.shape)}", flush=True)

    rng = np.random.default_rng(0)
    B, Din, H = 64, 32, 128
    x = rng.standard_normal((B, Din)).astype(np.float32)
    y = rng.standard_normal((B, Din)).astype(np.float32)
    w1 = (rng.standard_normal((Din, H)) * 0.2).astype(np.float32)
    w2 = (rng.standard_normal((H, Din)) * 0.2).astype(np.float32)

    def gput(a, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda i: a[i])

    xd, yd = gput(x, P("dp", None)), gput(y, P("dp", None))
    w1d, w2d = gput(w1, P(None, "tp")), gput(w2, P("tp", None))

    @jax.jit
    def step(w1, w2, x, y):
        # NB: cross-process arrays must be ARGUMENTS, not closures
        def loss(w1, w2):
            return jnp.mean((jnp.tanh(x @ w1) @ w2 - y) ** 2)

        l, (g1, g2) = jax.value_and_grad(loss, argnums=(0, 1))(w1, w2)
        return l, w1 - 0.1 * g1, w2 - 0.1 * g2

    for i in range(10):
        loss, w1d, w2d = step(w1d, w2d, xd, yd)
        if process_id == 0:
            print(f"step {i:2d}  loss {float(loss):.6f}", flush=True)
    print(f"MULTIHOST TRAIN OK pid={process_id} "
          f"final_loss={float(loss):.6f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="spawn 2 local workers over localhost")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices per worker (0 = real chips)")
    args = ap.parse_args()

    if args.worker:
        worker(args.coordinator, args.num_processes, args.process_id,
               args.local_devices)
        return

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(i),
         "--local-devices", str(args.local_devices)])
        for i in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker failed: rcs={rcs}")
    print("both workers finished")


if __name__ == "__main__":
    main()

"""Multi-host (multi-process) distributed runtime test.

The reference has no distributed execution at all (SURVEY §2.6); this
is the net-new DCN story: two REAL processes join one jax.distributed
cluster (CPU backend, Gloo cross-process collectives — the same code
path a TPU pod takes over DCN), build the framework's `multihost_mesh`
(dp spans hosts, tp stays inside a host), and run a tp-sharded +
dp-batched train step whose gradient all-reduce crosses the process
boundary. Both processes must agree with a single-device referee.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from whisper_tensor_tpu.parallel.mesh import distributed_init, multihost_mesh, named

distributed_init(coordinator=f"127.0.0.1:{port}", num_processes=2,
                 process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# dp spans the two "hosts" (4 ranks), tp=2 inside each host's domain
mesh = multihost_mesh(sp=1, tp=2)
assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2, dict(mesh.shape)

rng = np.random.default_rng(0)
B, Din, H = 32, 16, 64
x_full = rng.standard_normal((B, Din)).astype(np.float32)
y_full = rng.standard_normal((B, Din)).astype(np.float32)
w1_full = (rng.standard_normal((Din, H)) * 0.3).astype(np.float32)
w2_full = (rng.standard_normal((H, Din)) * 0.3).astype(np.float32)

def gput(a, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

# megatron layout: W1 column-sharded, W2 row-sharded over tp;
# the batch is dp-sharded, so the gradient all-reduce rides the
# cross-process (DCN-equivalent) links
x = gput(x_full, P("dp", None))
y = gput(y_full, P("dp", None))
w1 = gput(w1_full, P(None, "tp"))
w2 = gput(w2_full, P("tp", None))

def loss_fn(w1, w2, x, y):
    h = jnp.tanh(x @ w1)
    return jnp.mean((h @ w2 - y) ** 2)

@jax.jit
def step(w1, w2, x, y):
    loss, (g1, g2) = jax.value_and_grad(loss_fn, argnums=(0, 1))(w1, w2, x, y)
    return loss, w1 - 0.1 * g1, w2 - 0.1 * g2

loss, w1n, w2n = step(w1, w2, x, y)

# single-device referee (pure local math on the full arrays)
import numpy.testing as npt
def ref_step(w1, w2):
    h = np.tanh(x_full @ w1)
    pred = h @ w2
    loss = np.mean((pred - y_full) ** 2)
    gp = 2.0 * (pred - y_full) / pred.size
    g2 = h.T @ gp
    gh = gp @ w2.T
    g1 = x_full.T @ (gh * (1 - h * h))
    return loss, w1 - 0.1 * g1, w2 - 0.1 * g2

rl, rw1, rw2 = ref_step(w1_full, w2_full)
npt.assert_allclose(float(loss), rl, rtol=1e-5)
npt.assert_allclose(np.asarray(jax.device_get(
    jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(w1n))),
    rw1, rtol=1e-5, atol=1e-6)
npt.assert_allclose(np.asarray(jax.device_get(
    jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(w2n))),
    rw2, rtol=1e-5, atol=1e-6)
print(f"MULTIHOST OK pid={pid} loss={float(loss):.6f}", flush=True)
""" % {"repo": REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_train_step(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(CHILD)
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child sets its own
    procs = [subprocess.Popen([sys.executable, str(child), str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST OK" in out, out[-3000:]
    # both processes computed the same replicated loss
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST OK" in ln][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]

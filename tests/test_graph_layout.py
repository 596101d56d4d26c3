"""Server-side layered graph layout engine.

Reference: crates/whisper-tensor-ui/src/graph_explorer/graph_layout.rs
— longest-path layering, pull-up-under-children, long-edge breaking
into connection-by-name stubs. The Python engine must produce a layout
where every edge points strictly downward, stubs bound edge spans, and
barycenter ordering does not increase crossings.
"""

import numpy as np

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, random_gpt2_weights)
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.server.graph_layout import (build_layout,
                                                    count_crossings)
from whisper_tensor_tpu.server.model_server import ModelServer


def _graph_json():
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=64)
    m = Model.new_from_onnx(build_gpt2_step(
        random_gpt2_weights(cfg), cfg, max_len=64, dtype=DType.F32))
    return ModelServer()._graph_json(m.graph)


def test_layout_edges_point_downward():
    g = _graph_json()
    lay = build_layout(g)
    assert lay["nodes"] and lay["edges"]
    by_id = {nd["id"]: nd for nd in lay["nodes"]}
    for e in lay["edges"]:
        assert by_id[e["dst"]]["layer"] > by_id[e["src"]]["layer"], e
    # every op in the graph appears exactly once
    op_refs = [nd["ref"] for nd in lay["nodes"] if nd["kind"] == "op"]
    assert sorted(op_refs) == sorted(o["id"] for o in g["ops"])
    # geometry: no overlaps within a layer
    for li in range(lay["layers"]):
        row = sorted((nd for nd in lay["nodes"] if nd["layer"] == li),
                     key=lambda nd: nd["x"])
        for a, b in zip(row, row[1:]):
            assert a["x"] + a["w"] <= b["x"], (a, b)


def test_long_edges_break_into_stubs():
    g = _graph_json()
    lay = build_layout(g)
    by_id = {nd["id"]: nd for nd in lay["nodes"]}
    # no surviving edge spans more than the break threshold + 1
    for e in lay["edges"]:
        span = by_id[e["dst"]]["layer"] - by_id[e["src"]]["layer"]
        assert span <= 11, e
    # a 2-layer GPT-2 step graph reuses weights/caches across layers:
    # long edges MUST have been broken (residual stream + weight taps)
    kinds = {nd["kind"] for nd in lay["nodes"]}
    assert "conn_dst" in kinds
    # each conn_dst has exactly one outgoing edge into its consumer
    dsts = [nd["id"] for nd in lay["nodes"] if nd["kind"] == "conn_dst"]
    out_deg = {i: 0 for i in dsts}
    for e in lay["edges"]:
        if e["src"] in out_deg:
            out_deg[e["src"]] += 1
    assert all(v == 1 for v in out_deg.values())


def test_barycenter_no_worse_and_deterministic():
    g = _graph_json()
    lay1 = build_layout(g)
    lay2 = build_layout(g)
    assert lay1 == lay2, "layout must be deterministic"
    import whisper_tensor_tpu.server.graph_layout as gl

    old = gl.SWEEPS
    try:
        gl.SWEEPS = 0
        lay0 = build_layout(g)
    finally:
        gl.SWEEPS = old
    assert count_crossings(lay1) <= count_crossings(lay0)


def test_layout_ws_round_trip(tmp_path):
    """The get_graph_layout server message returns a renderable layout
    for a loaded model (and descends nested subgraphs)."""
    import asyncio
    import socket
    import threading
    import time

    from tests.test_server_cli import _WSClient
    from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
    from whisper_tensor_tpu.server.main import Server

    b = OnnxBuilder("lay")
    b.input("x", DType.F32, [4])
    y = b.node("Mul", ["x", b.const(np.asarray(2.0, np.float32))])
    b.node("Add", [y, b.const(np.asarray(1.0, np.float32))],
           outputs=["y"])
    b.output("y", DType.F32, [4])
    path = str(tmp_path / "lay.onnx")
    with open(path, "wb") as f:
        f.write(b.build())

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = Server()
    entries = srv.models.run_loader("onnx", {"path": path})
    mid = entries[0].id
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run("127.0.0.1", port))
        except RuntimeError:
            pass

    threading.Thread(target=run, daemon=True).start()
    time.sleep(0.5)
    c = _WSClient("127.0.0.1", port)
    try:
        c.send({"type": "get_graph_layout", "model_id": mid})
        for _ in range(50):
            m = c.recv()
            if m["type"] == "graph_layout":
                break
        lay = m["layout"]
        assert lay["width"] > 0 and lay["height"] > 0
        kinds = [nd["kind"] for nd in lay["nodes"]]
        # Mul+Add plus the importer's lowered Constant ops
        assert kinds.count("op") >= 2 and "input" in kinds \
            and "output" in kinds
    finally:
        c.close()
        loop.call_soon_threadsafe(loop.stop)

"""Importer IO tests: GGUF round trip + dequant, .pth pickle VM vs torch."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.packed_format import PackedFormat
from whisper_tensor_tpu.tensor import PackedTensor


class TestGGUF:
    def test_round_trip_f32_f16(self, tmp_path):
        from whisper_tensor_tpu.importers.gguf import GGUFFile, write_gguf

        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 8)).astype(np.float32)
        b = rng.standard_normal((16,)).astype(np.float16)
        meta = {"general.architecture": "llama", "llama.block_count": 2,
                "general.name": "test", "some.floats": [1.0, 2.0],
                "some.strings": ["x", "y"]}
        p = str(tmp_path / "t.gguf")
        write_gguf(p, meta, {"w.a": a, "w.b": b})
        g = GGUFFile(p)
        assert g.architecture == "llama"
        assert g.metadata["llama.block_count"] == 2
        assert g.metadata["some.strings"] == ["x", "y"]
        np.testing.assert_array_equal(g.load("w.a").numpy(), a)
        np.testing.assert_array_equal(g.load("w.b").numpy(), b)

    def test_quantized_tensor_round_trip(self, tmp_path):
        from whisper_tensor_tpu.importers.gguf import GGUFFile, write_gguf

        rng = np.random.default_rng(1)
        # build a Q8_0 packed tensor by hand-quantizing
        vals = rng.standard_normal((2, 64)).astype(np.float32)
        blocks = vals.reshape(-1, 32)
        out = bytearray()
        import struct

        for blk in blocks:
            d = float(np.abs(blk).max() / 127.0) or 1.0
            q = np.clip(np.round(blk / d), -127, 127).astype(np.int8)
            out += struct.pack("<e", d) + q.tobytes()
        pt = PackedTensor(bytes(out), PackedFormat.Q8_0, (2, 64))
        p = str(tmp_path / "q.gguf")
        write_gguf(p, {"general.architecture": "llama"}, {"wq": pt})
        g = GGUFFile(p)
        loaded = g.load("wq")
        assert isinstance(loaded, PackedTensor)
        deq = loaded.dequantize().numpy()
        np.testing.assert_allclose(deq, vals, atol=np.abs(vals).max() / 100)

    def test_lazy_store_entry(self, tmp_path):
        from whisper_tensor_tpu.importers.gguf import GGUFFile, write_gguf
        from whisper_tensor_tpu.symbolic_graph.tensor_store import TensorStore

        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "l.gguf")
        write_gguf(p, {"general.architecture": "x"}, {"t": a})
        g = GGUFFile(p)
        store = TensorStore()
        store.put("t", g.stored("t"))
        np.testing.assert_array_equal(store.get_numeric("t").numpy(), a)


class TestPth:
    def test_state_dict_round_trip(self, tmp_path):
        import torch

        from whisper_tensor_tpu.importers.pth import load_pth

        sd = {
            "layer.weight": torch.randn(4, 3),
            "layer.bias": torch.randn(4),
            "emb": torch.randn(10, 8).to(torch.bfloat16),
            "ints": torch.arange(6, dtype=torch.int64).reshape(2, 3),
            "half": torch.randn(5).half(),
        }
        p = str(tmp_path / "m.pth")
        torch.save(sd, p)
        out = load_pth(p)
        assert set(out) == set(sd)
        for k in sd:
            ref = sd[k].float().numpy() if sd[k].dtype in (torch.bfloat16, torch.half) \
                else sd[k].numpy()
            got = out[k]
            if got.dtype.kind not in "iu":
                got = got.astype(np.float32)
            np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-6)

    def test_non_contiguous_tensor(self, tmp_path):
        import torch

        from whisper_tensor_tpu.importers.pth import load_pth

        base = torch.randn(6, 6)
        sd = {"view": base.t()}  # transposed (stride-swapped) view
        p = str(tmp_path / "v.pth")
        torch.save(sd, p)
        out = load_pth(p)
        np.testing.assert_allclose(out["view"], base.t().numpy(), rtol=1e-6)

    def test_nested_dict(self, tmp_path):
        import torch

        from whisper_tensor_tpu.importers.pth import load_pth

        p = str(tmp_path / "n.pth")
        torch.save({"state_dict": {"a.b": torch.ones(2)}, "epoch": 3}, p)
        out = load_pth(p)
        np.testing.assert_array_equal(out["a.b"], [1.0, 1.0])

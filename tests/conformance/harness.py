"""ONNX conformance harness.

Reference equivalent: tests/onnx_testing.rs (1,991 LoC) which walks the
official ONNX node-test corpus (vendored submodule — EMPTY in this
image, so no corpus exists on disk). This harness regenerates an
equivalent suite: every case is a single-node (or small) ONNX model
whose expected outputs are computed by an INDEPENDENT oracle (numpy
formulas written per-case, or torch) — never by the framework itself.

Each case runs through the full Model path on both backends
(oracle interpreter and XLA jit), compared at the reference's
tolerances rtol=1e-3 / atol=1e-7 (onnx_testing.rs:22-28).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
from whisper_tensor_tpu.model import Model

RTOL = 1e-3
ATOL = 1e-7


@dataclass
class Case:
    name: str
    op_type: str
    inputs: Dict[str, np.ndarray]
    expected: List[np.ndarray]
    attrs: Dict = field(default_factory=dict)
    opset: int = 23
    domain: str = ""
    # inputs passed as initializers instead of graph inputs (weights)
    initializer_names: Sequence[str] = ()
    # skip the XLA backend (data-dependent shapes etc.)
    oracle_only: bool = False
    rtol: float = RTOL
    atol: float = ATOL
    # optional custom graph builder (multi-node cases: sequences,
    # optionals); called with the Case, returns a Model
    builder: Optional[Callable] = None

    def build_model(self) -> Model:
        if self.builder is not None:
            return self.builder(self)
        b = OnnxBuilder(self.name, opset=self.opset,
                        custom_opsets={"wt": 1} if self.domain else None)
        in_names = []
        for n, v in self.inputs.items():
            if v is None:  # absent optional input -> empty-name slot
                in_names.append("")
                continue
            v = np.asarray(v)
            if n in self.initializer_names:
                b.initializer(n, v)
            else:
                b.input(n, DType.from_numpy(v.dtype) if v.dtype != np.dtype(object)
                        else DType.STRING, list(v.shape))
            in_names.append(n)
        out_names = [f"out_{k}" for k in range(len(self.expected))]
        b.node(self.op_type, in_names, outputs=out_names, domain=self.domain,
               **self.attrs)
        for nm, e in zip(out_names, self.expected):
            if isinstance(e, list):
                # sequence-valued output: declare by element dtype only
                # (the interpreter carries sequences as python lists and
                # skips shape validation for them)
                el = np.asarray(e[0]) if e else np.zeros(0, np.float32)
                b.output(nm, DType.from_numpy(el.dtype)
                         if el.dtype != np.dtype(object) else DType.STRING,
                         [])
                continue
            e = np.asarray(e)
            b.output(nm, DType.from_numpy(e.dtype) if e.dtype != np.dtype(object)
                     else DType.STRING, list(e.shape))
        return Model.new_from_onnx(b.build(), name=self.name)


def _is_float(dt: np.dtype) -> bool:
    """True for numpy AND ml_dtypes floats (bf16/f8 have kind 'V')."""
    if dt.kind in "fc":
        return True
    try:
        import ml_dtypes

        ml_dtypes.finfo(dt)
        return True
    except Exception:
        return False


def check_case(case: Case, mode: str) -> None:
    model = case.build_model()
    feeds = {n: v for n, v in case.inputs.items()
             if n not in case.initializer_names and v is not None}
    out = model.eval(feeds, mode=mode)
    for k, expected in enumerate(case.expected):
        if isinstance(expected, list):
            got_seq = out[f"out_{k}"]
            assert isinstance(got_seq, list), \
                f"{case.name}: expected a sequence, got {type(got_seq)}"
            assert len(got_seq) == len(expected), \
                f"{case.name}: sequence length {len(got_seq)} != " \
                f"{len(expected)}"
            for gi, ei in zip(got_seq, expected):
                np.testing.assert_allclose(
                    np.asarray(gi, dtype=np.float64),
                    np.asarray(ei, dtype=np.float64), rtol=case.rtol,
                    atol=case.atol, err_msg=case.name, equal_nan=True)
            continue
        got = np.asarray(out[f"out_{k}"])
        expected = np.asarray(expected)
        assert got.shape == expected.shape, \
            f"{case.name}: shape {got.shape} != {expected.shape}"
        if expected.dtype == np.dtype(object):
            assert list(got.reshape(-1)) == list(expected.reshape(-1))
        elif _is_float(expected.dtype) or _is_float(got.dtype):
            np.testing.assert_allclose(
                got.astype(np.float64), expected.astype(np.float64),
                rtol=case.rtol, atol=case.atol, err_msg=case.name,
                equal_nan=True)
        else:
            np.testing.assert_array_equal(got, expected, err_msg=case.name)

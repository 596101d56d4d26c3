"""Sequence / Optional conformance cases, 1:1 with the reference's
enumerated list: sequence_insert_at_back/front, the 12 sequence_map
variants, the optional_get_element / optional_has_element matrix, the
seq-typed control-flow entries (if_seq, loop13_seq, loop16_seq_none),
and the one remaining bitwise spelling.

Sequences are interpreter-tier (python lists): every case is
oracle_only, like the reference runs them on its interpreter backend.
"""

from __future__ import annotations

import numpy as np

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)
from whisper_tensor_tpu.model import Model

from .harness import Case

CASES = []
_rng = np.random.default_rng(41)
_ST = WeightStorage.embed()


def _model(case, build):
    b = OnnxBuilder(case.name, opset=case.opset)
    build(b)
    return Model.new_from_onnx(b.build(), name=case.name)


def add(name, expected, build, inputs=None, opset=23, op="seq"):
    CASES.append(Case(
        name, op, inputs or {}, expected, oracle_only=False,
        opset=opset, atol=1e-5,
        builder=lambda case, _b=build: _model(case, _b)))


# --- SequenceInsert ------------------------------------------------------------

_T1 = _rng.standard_normal((2, 3)).astype(np.float32)
_T2 = _rng.standard_normal((2, 3)).astype(np.float32)
_T3 = _rng.standard_normal((2, 3)).astype(np.float32)


def _seq_insert(at_front):
    def build(b):
        b.input("x1", DType.F32, [2, 3])
        b.input("x2", DType.F32, [2, 3])
        b.input("x3", DType.F32, [2, 3])
        b.node("SequenceConstruct", ["x1", "x2"], outputs=["s"])
        if at_front:
            b.initializer("pos", np.asarray(0, np.int64))
            b.node("SequenceInsert", ["s", "x3", "pos"], outputs=["s2"])
        else:
            b.node("SequenceInsert", ["s", "x3"], outputs=["s2"])
        b.node("ConcatFromSequence", ["s2"], outputs=["out_0"],
               axis=0, new_axis=1)
        b.output("out_0", DType.F32, [3, 2, 3])

    return build


add("sequence_insert_at_back", [np.stack([_T1, _T2, _T3])],
    _seq_insert(False), inputs={"x1": _T1, "x2": _T2, "x3": _T3},
    op="SequenceInsert")
add("sequence_insert_at_front", [np.stack([_T3, _T1, _T2])],
    _seq_insert(True), inputs={"x1": _T1, "x2": _T2, "x3": _T3},
    op="SequenceInsert")


# --- SequenceMap ----------------------------------------------------------------

_S1 = [_rng.standard_normal((3, 4)).astype(np.float32) for _ in range(3)]
_S2 = [_rng.standard_normal((3, 4)).astype(np.float32) for _ in range(3)]
_TB = _rng.standard_normal((3, 4)).astype(np.float32)


def _map_body(n_in, op):
    body = OnnxBuilder("body")
    names = [f"b{i}" for i in range(n_in)]
    for n in names:
        body.input(n, DType.F32, [3, 4])
    if op == "identity":
        body.node("Identity", [names[0]], outputs=["bo"])
        body.output("bo", DType.F32, [3, 4])
    elif op == "add":
        body.node("Add", names[:2], outputs=["bo"])
        body.output("bo", DType.F32, [3, 4])
    elif op == "shape":
        body.node("Shape", [names[0]], outputs=["bo"])
        body.output("bo", DType.I64, [2])
    return body.build_graph_proto(_ST)


def _seq_map(name, seqs, extra_tensor, body_op, expected, n_extra_seq=0):
    n_in = len(seqs) + (1 if extra_tensor is not None else 0)

    def build(b):
        feed_names = []
        for si, seq in enumerate(seqs):
            el_names = []
            for ei in range(len(seq)):
                nm = f"s{si}_{ei}"
                b.input(nm, DType.F32, [3, 4])
                el_names.append(nm)
                feed_names.append(nm)
            b.node("SequenceConstruct", el_names, outputs=[f"seq{si}"])
        args = [f"seq{si}" for si in range(len(seqs))]
        if extra_tensor is not None:
            b.input("t", DType.F32, [3, 4])
            args.append("t")
        b.node("SequenceMap", args, outputs=["mapped"],
               body=_map_body(n_in, body_op))
        b.node("ConcatFromSequence", ["mapped"], outputs=["out_0"],
               axis=0, new_axis=1)
        if body_op == "shape":
            b.output("out_0", DType.I64, [len(seqs[0]), 2])
        else:
            b.output("out_0", DType.F32, [len(seqs[0]), 3, 4])

    inputs = {}
    for si, seq in enumerate(seqs):
        for ei, el in enumerate(seq):
            inputs[f"s{si}_{ei}"] = el
    if extra_tensor is not None:
        inputs["t"] = extra_tensor
    add(name, [expected], build, inputs=inputs, op="SequenceMap")


_seq_map("sequence_map_identity_1_sequence", [_S1], None, "identity",
         np.stack(_S1))
_seq_map("sequence_map_identity_1_sequence_expanded", [_S1], None,
         "identity", np.stack(_S1))
_seq_map("sequence_map_identity_2_sequences", [_S1, _S2], None,
         "identity", np.stack(_S1))
_seq_map("sequence_map_identity_2_sequences_expanded", [_S1, _S2], None,
         "identity", np.stack(_S1))
_seq_map("sequence_map_identity_1_sequence_1_tensor", [_S1], _TB,
         "identity", np.stack(_S1))
_seq_map("sequence_map_identity_1_sequence_1_tensor_expanded", [_S1],
         _TB, "identity", np.stack(_S1))
_seq_map("sequence_map_add_2_sequences", [_S1, _S2], None, "add",
         np.stack([a + b for a, b in zip(_S1, _S2)]))
_seq_map("sequence_map_add_2_sequences_expanded", [_S1, _S2], None,
         "add", np.stack([a + b for a, b in zip(_S1, _S2)]))
_seq_map("sequence_map_add_1_sequence_1_tensor", [_S1], _TB, "add",
         np.stack([a + _TB for a in _S1]))
_seq_map("sequence_map_add_1_sequence_1_tensor_expanded", [_S1], _TB,
         "add", np.stack([a + _TB for a in _S1]))
_seq_map("sequence_map_extract_shapes", [_S1], None, "shape",
         np.tile(np.array([3, 4], np.int64), (3, 1)))
_seq_map("sequence_map_extract_shapes_expanded", [_S1], None, "shape",
         np.tile(np.array([3, 4], np.int64), (3, 1)))


# --- Optional matrix -------------------------------------------------------------

_OX = _rng.standard_normal((4,)).astype(np.float32)


def _opt_case(name, kind):
    def build(b):
        if kind == "get_tensor":             # plain tensor passthrough
            b.input("x", DType.F32, [4])
            b.node("OptionalGetElement", ["x"], outputs=["out_0"])
            b.output("out_0", DType.F32, [4])
        elif kind == "get_optional_tensor":  # optional(tensor)
            b.input("x", DType.F32, [4])
            b.node("Optional", ["x"], outputs=["o"])
            b.node("OptionalGetElement", ["o"], outputs=["out_0"])
            b.output("out_0", DType.F32, [4])
        elif kind == "get_sequence":
            b.input("x", DType.F32, [4])
            b.node("SequenceConstruct", ["x"], outputs=["s"])
            b.node("OptionalGetElement", ["s"], outputs=["s2"])
            b.node("ConcatFromSequence", ["s2"], outputs=["out_0"],
                   axis=0)
            b.output("out_0", DType.F32, [4])
        elif kind == "get_optional_sequence":
            b.input("x", DType.F32, [4])
            b.node("SequenceConstruct", ["x"], outputs=["s"])
            b.node("Optional", ["s"], outputs=["o"])
            b.node("OptionalGetElement", ["o"], outputs=["s2"])
            b.node("ConcatFromSequence", ["s2"], outputs=["out_0"],
                   axis=0)
            b.output("out_0", DType.F32, [4])
        elif kind == "has_tensor":
            b.input("x", DType.F32, [4])
            b.node("OptionalHasElement", ["x"], outputs=["out_0"])
            b.output("out_0", DType.BOOL, [])
        elif kind == "has_optional":
            b.input("x", DType.F32, [4])
            b.node("Optional", ["x"], outputs=["o"])
            b.node("OptionalHasElement", ["o"], outputs=["out_0"])
            b.output("out_0", DType.BOOL, [])
        elif kind == "has_empty_optional":
            b.node("Optional", [], outputs=["o"], type=1)
            b.node("OptionalHasElement", ["o"], outputs=["out_0"])
            b.output("out_0", DType.BOOL, [])
        elif kind == "has_no_input":
            b.node("OptionalHasElement", [], outputs=["out_0"])
            b.output("out_0", DType.BOOL, [])

    needs_x = kind not in ("has_empty_optional", "has_no_input")
    exp = (_OX if kind.startswith("get") and "sequence" not in kind
           else _OX if kind.startswith("get")
           else np.asarray(kind in ("has_tensor", "has_optional")))
    add(name, [exp], build, inputs={"x": _OX} if needs_x else {},
        op=("OptionalGetElement" if kind.startswith("get")
            else "OptionalHasElement"))


_opt_case("optional_get_element_tensor", "get_tensor")
_opt_case("optional_get_element_optional_tensor", "get_optional_tensor")
_opt_case("optional_get_element_sequence", "get_sequence")
_opt_case("optional_get_element_optional_sequence",
          "get_optional_sequence")
_opt_case("optional_has_element_tensor_input", "has_tensor")
_opt_case("optional_has_element_optional_input", "has_optional")
_opt_case("optional_has_element_empty_optional_input",
          "has_empty_optional")
_opt_case("optional_has_element_empty_no_input_name_optional_input",
          "has_no_input")
_opt_case("optional_has_element_empty_no_input_name_tensor_input",
          "has_no_input")
_opt_case("optional_has_element_empty_no_input_optional_input",
          "has_no_input")
_opt_case("optional_has_element_empty_no_input_tensor_input",
          "has_no_input")


# --- seq-typed control flow -------------------------------------------------------


def _if_seq(b):
    tb = OnnxBuilder("then")
    tb.initializer("tv", np.array([1., 2., 3.], np.float32))
    tb.node("SequenceConstruct", ["tv", "tv"], outputs=["so"])
    tb.output("so", DType.F32, [])
    eb = OnnxBuilder("else")
    eb.initializer("ev", np.array([-1., -2., -3.], np.float32))
    eb.node("SequenceConstruct", ["ev"], outputs=["so"])
    eb.output("so", DType.F32, [])
    b.initializer("cond", np.asarray(True))
    b.node("If", ["cond"], outputs=["sq"],
           then_branch=tb.build_graph_proto(_ST),
           else_branch=eb.build_graph_proto(_ST))
    b.node("ConcatFromSequence", ["sq"], outputs=["out_0"], axis=0,
           new_axis=1)
    b.output("out_0", DType.F32, [2, 3])


add("if_seq", [np.stack([np.array([1., 2., 3.], np.float32)] * 2)],
    _if_seq, op="If")


def _loop13_seq(b):
    # official loop13_seq: each iteration inserts x[: i+1]'s slice into
    # the carried sequence
    body = OnnxBuilder("body")
    body.input("i", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("seq_in", DType.F32, [])
    body.initializer("x", np.array([1., 2., 3., 4., 5.], np.float32))
    body.initializer("zero", np.array([0], np.int64))
    body.initializer("one_i", np.asarray(1, np.int64))
    body.node("Identity", ["cond_in"], outputs=["cond_out"])
    body.node("Add", ["i", "one_i"], outputs=["end_s"])
    body.initializer("wt_axes0", np.array([0], np.int64))
    body.node("Unsqueeze", ["end_s", "wt_axes0"], outputs=["end"])
    body.node("Slice", ["x", "zero", "end"], outputs=["piece"])
    body.node("SequenceInsert", ["seq_in", "piece"], outputs=["seq_out"])
    body.output("cond_out", DType.BOOL, [])
    body.output("seq_out", DType.F32, [])
    g = body.build_graph_proto(_ST)
    b.initializer("m", np.asarray(3, np.int64))
    b.initializer("cond", np.asarray(True))
    b.node("SequenceEmpty", [], outputs=["seq0"])
    b.node("Loop", ["m", "cond", "seq0"], outputs=["seq_f"], body=g)
    b.node("ConcatFromSequence", ["seq_f"], outputs=["out_0"], axis=0)
    b.output("out_0", DType.F32, [6])


add("loop13_seq",
    [np.array([1., 1., 2., 1., 2., 3.], np.float32)], _loop13_seq,
    op="Loop")


def _loop16_seq_none(b):
    # carries an OPTIONAL sequence; inserts only on later iterations
    body = OnnxBuilder("body")
    body.input("i", DType.I64, [])
    body.input("cond_in", DType.BOOL, [])
    body.input("opt_in", DType.F32, [])
    body.initializer("x", np.array([7., 8.], np.float32))
    body.node("Identity", ["cond_in"], outputs=["cond_out"])
    body.node("OptionalHasElement", ["opt_in"], outputs=["has"])
    tb = OnnxBuilder("then")   # has element: use carried sequence
    tb.node("OptionalGetElement", ["opt_in"], outputs=["sq"])
    tb.output("sq", DType.F32, [])
    eb = OnnxBuilder("else")   # first iteration: fresh sequence
    eb.node("SequenceEmpty", [], outputs=["sq"])
    eb.output("sq", DType.F32, [])
    body.node("If", ["has"], outputs=["seq_base"],
              then_branch=tb.build_graph_proto(_ST),
              else_branch=eb.build_graph_proto(_ST))
    body.node("SequenceInsert", ["seq_base", "x"], outputs=["seq_new"])
    body.node("Optional", ["seq_new"], outputs=["opt_out"])
    body.output("cond_out", DType.BOOL, [])
    body.output("opt_out", DType.F32, [])
    g = body.build_graph_proto(_ST)
    b.initializer("m", np.asarray(3, np.int64))
    b.initializer("cond", np.asarray(True))
    b.node("Optional", [], outputs=["opt0"], type=1)
    b.node("Loop", ["m", "cond", "opt0"], outputs=["opt_f"], body=g)
    b.node("OptionalGetElement", ["opt_f"], outputs=["seq_f"])
    b.node("ConcatFromSequence", ["seq_f"], outputs=["out_0"], axis=0)
    b.output("out_0", DType.F32, [6])


add("loop16_seq_none", [np.array([7., 8.] * 3, np.float32)],
    _loop16_seq_none, op="Loop")

# the one remaining bitwise spelling from the official list
_BOA = _rng.integers(0, 100, (2, 3, 4, 5)).astype(np.int16)
_BOB = _rng.integers(0, 100, (2, 3, 4, 5)).astype(np.int16)
CASES.append(Case("bitwise_or_i16_4d", "BitwiseOr",
                  {"a": _BOA, "b": _BOB}, [np.bitwise_or(_BOA, _BOB)]))

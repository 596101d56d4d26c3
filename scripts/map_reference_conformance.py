"""Map the reference's enumerated ONNX conformance list 1:1 onto this
repo's regenerated suite.

The reference statically enumerates ~1,276 official ONNX node-test
names (do_test! macros, /root/reference/tests/onnx_testing.rs:
1960-1990). The official corpus is absent from this image (empty
submodule), so the repo's suite was regenerated with independent
oracles — which leaves blind spots invisible by construction. This
script parses the reference's active names, maps each onto a repo case
(op must match exactly; variant tokens scored), and emits
tests/conformance/reference_map_generated.py with the mapping table +
the unmapped remainder for manual casework.

Usage: python scripts/map_reference_conformance.py [--emit]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))

REF_FILE = "/root/reference/tests/onnx_testing.rs"

# corpus-name token -> ONNX op type. Longest token wins. Tokens are the
# lowercase op spelling used by the official corpus file names.
OP_TOKENS = {
    # --- plain lowercase spellings -------------------------------------
    "acosh": "Acosh", "acos": "Acos", "asinh": "Asinh", "asin": "Asin",
    "atanh": "Atanh", "atan": "Atan", "add": "Add", "and": "And",
    "abs": "Abs", "affine_grid": "AffineGrid",
    "ai_onnx_ml_array_feature_extractor": "ArrayFeatureExtractor",
    "ai_onnx_ml_binarizer": "Binarizer",
    "ai_onnx_ml_label_encoder": "LabelEncoder",
    "ai_onnx_ml_tree_ensemble": "TreeEnsemble",
    "argmax": "ArgMax", "argmin": "ArgMin",
    "attention": "Attention", "averagepool": "AveragePool",
    "basic_conv": "Conv", "batchnorm": "BatchNormalization",
    "bernoulli": "Bernoulli", "bitshift": "BitShift",
    "bitwise_and": "BitwiseAnd", "bitwise_or": "BitwiseOr",
    "bitwise_xor": "BitwiseXor", "bitwise_not": "BitwiseNot",
    "blackmanwindow": "BlackmanWindow", "cast_like": "CastLike",
    "castlike": "CastLike", "cast": "Cast", "ceil": "Ceil",
    "celu": "Celu", "center_crop_pad": "CenterCropPad",
    "clip": "Clip", "col2im": "Col2Im", "compress": "Compress",
    "concat_in_sequence": "SequenceInsert", "concat": "Concat",
    "constantofshape": "ConstantOfShape", "constant_pad": "Pad",
    "constant": "Constant", "convinteger": "ConvInteger",
    "convtranspose": "ConvTranspose", "conv": "Conv",
    "cosh": "Cosh", "cos": "Cos", "cumsum": "CumSum",
    "deform_conv": "DeformConv", "depthtospace": "DepthToSpace",
    "dequantizelinear": "DequantizeLinear", "det": "Det",
    "dft": "DFT", "div": "Div", "dropout": "Dropout",
    "dynamicquantizelinear": "DynamicQuantizeLinear",
    "edge_pad": "Pad", "einsum": "Einsum", "elu": "Elu",
    "equal": "Equal", "erf": "Erf", "expand": "Expand", "exp": "Exp",
    "eyelike": "EyeLike", "flatten": "Flatten", "floor": "Floor",
    "gathernd": "GatherND", "gather_elements": "GatherElements",
    "gather": "Gather", "gelu": "Gelu", "gemm": "Gemm",
    "globalaveragepool": "GlobalAveragePool",
    "globalmaxpool": "GlobalMaxPool",
    "greater_equal": "GreaterOrEqual", "greater": "Greater",
    "gridsample": "GridSample", "gru": "GRU",
    "group_normalization": "GroupNormalization",
    "hammingwindow": "HammingWindow", "hannwindow": "HannWindow",
    "hardmax": "Hardmax", "hardsigmoid": "HardSigmoid",
    "hardswish": "HardSwish", "identity": "Identity",
    "if": "If", "image_decoder": "ImageDecoder",
    "instancenorm": "InstanceNormalization", "isinf": "IsInf",
    "isnan": "IsNaN", "layer_normalization": "LayerNormalization",
    "leakyrelu": "LeakyRelu", "less_equal": "LessOrEqual",
    "less": "Less", "log_softmax": "LogSoftmax", "log": "Log",
    "logsoftmax": "LogSoftmax", "loop": "Loop",
    "lppool": "LpPool", "lpnormalization": "LpNormalization",
    "lrn": "LRN", "lstm": "LSTM", "matmulinteger": "MatMulInteger",
    "matmul": "MatMul", "maxpool": "MaxPool",
    "maxunpool": "MaxUnpool", "max": "Max",
    "mean": "Mean", "melweightmatrix": "MelWeightMatrix",
    "min": "Min", "mish": "Mish", "mod": "Mod",
    "momentum": "Momentum", "mul": "Mul", "mvn": "MeanVarianceNormalization",
    "neg": "Neg",
    "nesterov_momentum": "Momentum",
    "nllloss": "NegativeLogLikelihoodLoss",
    "nonmaxsuppression": "NonMaxSuppression", "nonzero": "NonZero",
    "not": "Not", "onehot": "OneHot", "optional_get_element": "OptionalGetElement",
    "optional_has_element": "OptionalHasElement", "or": "Or",
    "pow": "Pow", "prelu": "PRelu",
    "qlinearconv": "QLinearConv", "qlinearmatmul": "QLinearMatMul",
    "quantizelinear": "QuantizeLinear",
    "range": "Range", "reciprocal": "Reciprocal",
    "reduce_l1": "ReduceL1", "reduce_l2": "ReduceL2",
    "reduce_log_sum_exp": "ReduceLogSumExp",
    "reduce_log_sum": "ReduceLogSum", "reduce_max": "ReduceMax",
    "reduce_mean": "ReduceMean", "reduce_min": "ReduceMin",
    "reduce_prod": "ReduceProd",
    "reduce_sum_square": "ReduceSumSquare", "reduce_sum": "ReduceSum",
    "reflect_pad": "Pad", "relu": "Relu",
    "reshape": "Reshape", "resize": "Resize",
    "reversesequence": "ReverseSequence",
    "rms_normalization": "RMSNormalization",
    "rnn": "RNN", "roialign": "RoiAlign",
    "rotary_embedding": "RotaryEmbedding", "round": "Round",
    "scan": "Scan", "scatternd": "ScatterND",
    "scatter_elements": "ScatterElements", "scatter": "Scatter",
    "sce": "SoftmaxCrossEntropyLoss", "selu": "Selu",
    "sequence_insert": "SequenceInsert", "sequence_map": "SequenceMap",
    "shape": "Shape", "shrink": "Shrink", "sigmoid": "Sigmoid",
    "sign": "Sign", "simple_rnn": "RNN", "sinh": "Sinh", "sin": "Sin",
    "size": "Size", "slice": "Slice",
    "softmax": "Softmax", "softplus": "Softplus", "softsign": "Softsign",
    "spacetodepth": "SpaceToDepth",
    "split_to_sequence": "SplitToSequence", "split": "Split",
    "sqrt": "Sqrt", "squeeze": "Squeeze", "stft": "STFT",
    "strnormalizer": "StringNormalizer",
    "string_concat": "StringConcat", "string_split": "StringSplit",
    "sub": "Sub", "sum": "Sum",
    "tanh": "Tanh", "tan": "Tan",
    "tfidfvectorizer": "TfIdfVectorizer",
    "thresholdedrelu": "ThresholdedRelu", "tile": "Tile",
    "top_k": "TopK", "training_dropout": "Dropout",
    "transpose": "Transpose", "tril": "Trilu", "triu": "Trilu",
    "unsqueeze": "Unsqueeze", "upsample": "Resize",
    "where": "Where", "wrap_pad": "Pad", "xor": "Xor",
    "adagrad": "Adagrad", "adam": "Adam",
    "hardsigmoid_default": "HardSigmoid",
    "pad": "Pad", "unique": "Unique",
    # corpus spellings without an underscore after the op token
    "and2d": "And", "and3d": "And", "and4d": "And",
    "or2d": "Or", "or3d": "Or", "or4d": "Or",
    "xor2d": "Xor", "xor3d": "Xor", "xor4d": "Xor",
    "regex_full_match": "RegexFullMatch",
    "basic_deform_conv": "DeformConv",
    "loop11": "Loop", "loop13": "Loop", "loop16": "Loop",
    "scan9": "Scan",
}

# repo-name synonym tokens (variant vocabulary normalization)
SYN = {
    "bcast": {"bcast", "broadcast", "br"},
    "example": {"example", "basic", "simple", "f32", "default"},
    "default": {"default", "basic", "f32", "defaults"},
    "neg": {"neg", "negative"},
    "negative": {"neg", "negative"},
    "axes": {"axes", "axis"},
    "dim": {"dim", "axis"},
    "expanded": {"expanded"},
}


def ref_names():
    act = []
    pat = re.compile(r"^\s*do_test!\(\$runner_fn, \$runner_name, "
                     r"([a-z0-9_]+)\)")
    for line in open(REF_FILE):
        m = pat.match(line)
        if m:
            act.append(m.group(1))
    return act


def op_of(body: str):
    """Longest OP_TOKENS key that prefixes the body."""
    best = None
    for tok, op in OP_TOKENS.items():
        if body == tok or body.startswith(tok + "_"):
            if best is None or len(tok) > len(best[0]):
                best = (tok, op)
    return best


def tokens(s: str):
    return set(t for t in s.split("_") if t)


def score(variant_toks, cand_toks):
    """Penalty-scored token match: shared tokens good, tokens present
    on only one side bad (a bcast ref must not map to a non-bcast
    case)."""
    inter = 0
    for v in variant_toks:
        group = SYN.get(v, {v})
        if group & cand_toks:
            inter += 1
    missing = len(variant_toks) - inter
    extra = len(cand_toks - variant_toks
                - {"f32", "f64", "i32", "i64", "basic"})
    return inter * 2 - missing * 2 - extra


def main():
    from conformance.test_conformance import ALL_CASES

    by_op = {}
    for c in ALL_CASES:
        by_op.setdefault(c.op_type, []).append(c.name)

    refs = ref_names()
    mapped, unmapped = {}, []
    for r in refs:
        body = r[5:] if r.startswith("test_") else r
        hit = op_of(body)
        if hit is None:
            unmapped.append((r, "?op", None))
            continue
        tok, op = hit
        variant = body[len(tok):].lstrip("_")
        cands = by_op.get(op, [])
        if not cands:
            unmapped.append((r, "no-op", op))
            continue
        vt = tokens(variant)
        best, best_s = None, -10**9
        for cand in cands:
            s = score(vt, tokens(cand))
            if s > best_s:
                best, best_s = cand, s
        # require every variant token accounted for (no silent
        # variant downgrades); empty variants accept the top case
        need = len(vt) * 2 - 0  # all matched, no missing
        if best_s >= len(vt) * 2 - max(0, len(tokens(best)) - len(vt)) \
                and all(SYN.get(v, {v}) & tokens(best) for v in vt):
            mapped[r] = best
        else:
            unmapped.append((r, "variant", op))
    print(f"refs={len(refs)} mapped={len(mapped)} "
          f"unmapped={len(unmapped)}")
    import collections

    why = collections.Counter(u[1] for u in unmapped)
    print(why)
    byop = collections.Counter(u[2] for u in unmapped)
    print(byop.most_common(40))
    with open("/tmp/unmapped.txt", "w") as f:
        for r, why_, op in sorted(unmapped):
            f.write(f"{r}\t{why_}\t{op}\n")
    with open("/tmp/mapped.txt", "w") as f:
        for r, c in sorted(mapped.items()):
            f.write(f"{r}\t{c}\n")
    if "--emit" in sys.argv:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "tests", "conformance",
                           "reference_map.tsv")
        with open(out, "w") as f:
            f.write("# reference onnx_testing.rs test name -> repo "
                    "conformance case (regenerated suite)\n"
                    f"# {len(mapped)}/{len(set(refs))} unique reference "
                    "names mapped; generator: scripts/"
                    "map_reference_conformance.py --emit\n")
            for r, c in sorted(mapped.items()):
                f.write(f"{r}\t{c}\n")
            for r, why_, op in sorted(unmapped):
                f.write(f"{r}\tUNMAPPED({why_}:{op})\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

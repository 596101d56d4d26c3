"""SoftmaxCrossEntropyLoss + NegativeLogLikelihoodLoss conformance
cases, 1:1 with the official corpus names the reference enumerates
(tests/onnx_testing.rs test_sce_* / test_nllloss_*).

Oracle: local numpy (float64 log-softmax + weighted NLL reduction),
independent of the framework's lowering.
"""

from __future__ import annotations

import numpy as np

from .harness import Case


def _log_softmax(x, axis=1):
    m = np.max(x, axis=axis, keepdims=True)
    e = x - m
    return e - np.log(np.exp(e).sum(axis=axis, keepdims=True))


def _sce_oracle(scores, labels, weights=None, reduction="mean",
                ignore_index=None):
    logp = _log_softmax(scores.astype(np.float64), 1)
    return _nll_oracle(logp, labels, weights, reduction, ignore_index), \
        logp.astype(np.float32)


def _nll_oracle(x, labels, weights=None, reduction="mean",
                ignore_index=None):
    x = x.astype(np.float64)
    keep = np.ones(labels.shape, bool)
    safe = labels
    if ignore_index is not None:
        keep = labels != ignore_index
        safe = np.where(keep, labels, 0)
    idx = np.expand_dims(safe, 1)
    pick = np.take_along_axis(x, idx, axis=1).squeeze(1)
    loss = -pick
    w = None
    if weights is not None:
        w = weights.astype(np.float64)[safe]
    if ignore_index is not None:
        w = keep.astype(np.float64) if w is None else w * keep
    if w is not None:
        loss = loss * w
    if reduction == "none":
        return loss.astype(np.float32)
    if reduction == "sum":
        return np.float32(loss.sum())
    if w is None:
        return np.float32(loss.mean())
    return np.float32(loss.sum() / w.sum())


def _mk(name, *, op, shape=(3, 5), reduction="mean", weights=False,
        ignore_index=None, log_prob=False):
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    N, C = shape[0], shape[1]
    x = rng.standard_normal(shape).astype(np.float32)
    lshape = (N,) + shape[2:]
    labels = rng.integers(0, C, lshape).astype(np.int64)
    if ignore_index is not None:
        # official ii cases plant the ignored value into the labels
        flat = labels.reshape(-1)
        flat[:: max(1, flat.size // 3)] = ignore_index
    w = (rng.random(C).astype(np.float32) + 0.2) if weights else None
    attrs = {"reduction": reduction}
    if ignore_index is not None:
        attrs["ignore_index"] = ignore_index
    inputs = {"x": x, "labels": labels}
    if w is not None:
        inputs["weights"] = w
    if op == "SoftmaxCrossEntropyLoss":
        loss, logp = _sce_oracle(x, labels, w, reduction, ignore_index)
        expected = [loss, logp] if log_prob else [loss]
    else:
        loss = _nll_oracle(x, labels, w, reduction, ignore_index)
        expected = [loss]
    return Case(name, op, inputs, expected, attrs=attrs, atol=1e-5)


def _sce_family():
    out = []
    # (suffix, kwargs) — mirrors the official generator matrix
    base = [
        ("sce_mean", dict(reduction="mean")),
        ("sce_mean_3d", dict(reduction="mean", shape=(3, 5, 2))),
        ("sce_mean_weight", dict(reduction="mean", weights=True)),
        ("sce_mean_weight_ii", dict(reduction="mean", weights=True,
                                    ignore_index=0)),
        ("sce_mean_weight_ii_3d", dict(reduction="mean", weights=True,
                                       ignore_index=1, shape=(3, 5, 2))),
        ("sce_mean_weight_ii_4d", dict(reduction="mean", weights=True,
                                       ignore_index=2, shape=(3, 5, 2, 7))),
        ("sce_mean_no_weight_ii", dict(reduction="mean", ignore_index=2)),
        ("sce_mean_no_weight_ii_3d", dict(reduction="mean", ignore_index=1,
                                          shape=(3, 5, 2))),
        ("sce_mean_no_weight_ii_4d", dict(reduction="mean", ignore_index=2,
                                          shape=(3, 5, 2, 7))),
        ("sce_none", dict(reduction="none")),
        ("sce_none_weights", dict(reduction="none", weights=True)),
        ("sce_sum", dict(reduction="sum")),
    ]
    for nm, kw in base:
        out.append(_mk(nm, op="SoftmaxCrossEntropyLoss", **kw))
        out.append(_mk(nm + "_log_prob", op="SoftmaxCrossEntropyLoss",
                       log_prob=True, **kw))
    for c in list(out):
        out.append(Case(c.name + "_expanded", c.op_type, c.inputs,
                        c.expected, attrs=c.attrs, atol=c.atol))
    return out


def _nll_family():
    out = []
    base = [
        ("nllloss_NC", dict(shape=(3, 5))),
        ("nllloss_NCd1", dict(shape=(3, 5, 2))),
        ("nllloss_NCd1_ii", dict(shape=(3, 5, 2), ignore_index=1)),
        ("nllloss_NCd1_mean_weight_negative_ii",
         dict(shape=(3, 5, 6), ignore_index=-1, weights=True)),
        ("nllloss_NCd1_weight", dict(shape=(3, 5, 2), weights=True)),
        ("nllloss_NCd1_weight_ii", dict(shape=(3, 5, 2), weights=True,
                                        ignore_index=1)),
        ("nllloss_NCd1d2", dict(shape=(3, 5, 6, 6))),
        ("nllloss_NCd1d2_no_weight_reduction_mean_ii",
         dict(shape=(3, 5, 6, 6), ignore_index=1)),
        ("nllloss_NCd1d2_reduction_mean", dict(shape=(3, 5, 6, 6),
                                               reduction="mean")),
        ("nllloss_NCd1d2_reduction_sum", dict(shape=(3, 5, 6, 6),
                                              reduction="sum")),
        ("nllloss_NCd1d2_with_weight", dict(shape=(3, 5, 6, 6),
                                            weights=True)),
        ("nllloss_NCd1d2_with_weight_reduction_mean",
         dict(shape=(3, 5, 6, 6), weights=True, reduction="mean")),
        ("nllloss_NCd1d2_with_weight_reduction_sum",
         dict(shape=(3, 5, 6, 6), weights=True, reduction="sum")),
        ("nllloss_NCd1d2_with_weight_reduction_sum_ii",
         dict(shape=(3, 5, 6, 6), weights=True, reduction="sum",
              ignore_index=0)),
        ("nllloss_NCd1d2d3_none_no_weight_negative_ii",
         dict(shape=(3, 5, 6, 6, 5), reduction="none", ignore_index=-5)),
        ("nllloss_NCd1d2d3_sum_weight_high_ii",
         dict(shape=(3, 5), reduction="sum", weights=True,
              ignore_index=10)),
        ("nllloss_NCd1d2d3d4d5_mean_weight",
         dict(shape=(3, 5, 6, 6, 5, 3, 4), weights=True)),
        ("nllloss_NCd1d2d3d4d5_none_no_weight",
         dict(shape=(3, 5, 6, 6, 5, 3, 4), reduction="none")),
    ]
    for nm, kw in base:
        out.append(_mk(nm, op="NegativeLogLikelihoodLoss", **kw))
    for c in list(out):
        out.append(Case(c.name + "_expanded", c.op_type, c.inputs,
                        c.expected, attrs=c.attrs, atol=c.atol))
    return out


CASES = _sce_family() + _nll_family()

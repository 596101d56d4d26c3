"""Reduce*/ArgMax/ArgMin conformance cases named 1:1 after the official
corpus list the reference enumerates (tests/onnx_testing.rs — the full
opset-18 reduce matrix incl. empty_set identities, bool inputs, the
noop_with_empty_axes form, and select_last_index arg variants).

Name-driven generator: every variant token in the official name maps to
case construction; expected values are plain numpy float64 formulas.
"""

from __future__ import annotations

import numpy as np

from .harness import Case

_FNS = {
    "reduce_l1": lambda x, ax, kd: np.abs(x).sum(axis=ax, keepdims=kd),
    "reduce_l2": lambda x, ax, kd: np.sqrt(
        (x * x).sum(axis=ax, keepdims=kd)),
    "reduce_log_sum_exp": lambda x, ax, kd: np.log(
        np.exp(x).sum(axis=ax, keepdims=kd)),
    "reduce_log_sum": lambda x, ax, kd: np.log(
        x.sum(axis=ax, keepdims=kd)),
    "reduce_sum_square": lambda x, ax, kd: (x * x).sum(axis=ax,
                                                       keepdims=kd),
    "reduce_sum": lambda x, ax, kd: x.sum(axis=ax, keepdims=kd),
    "reduce_mean": lambda x, ax, kd: x.mean(axis=ax, keepdims=kd),
    "reduce_prod": lambda x, ax, kd: x.prod(axis=ax, keepdims=kd),
    "reduce_max": lambda x, ax, kd: x.max(axis=ax, keepdims=kd),
    "reduce_min": lambda x, ax, kd: x.min(axis=ax, keepdims=kd),
}
_OPS = {
    "reduce_l1": "ReduceL1", "reduce_l2": "ReduceL2",
    "reduce_log_sum_exp": "ReduceLogSumExp",
    "reduce_log_sum": "ReduceLogSum",
    "reduce_sum_square": "ReduceSumSquare", "reduce_sum": "ReduceSum",
    "reduce_mean": "ReduceMean", "reduce_prod": "ReduceProd",
    "reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
}
_EMPTY_FILL = {"reduce_l1": 0.0, "reduce_l2": 0.0,
               "reduce_log_sum_exp": -np.inf, "reduce_log_sum": -np.inf,
               "reduce_sum_square": 0.0, "reduce_sum": 0.0,
               "reduce_prod": 1.0, "reduce_max": -np.inf,
               "reduce_min": np.inf}


def _reduce_case(name: str) -> Case:
    fam = next(f for f in sorted(_FNS, key=len, reverse=True)
               if name.startswith(f))
    body = name[len(fam):].lstrip("_").replace("_expanded", "")
    rng = np.random.default_rng(abs(hash(name.replace(
        "_expanded", ""))) % (2**31))
    kd = "do_not_keepdims" not in body
    attrs = {"keepdims": int(kd)}
    axes = np.array([1], np.int64)
    if "default_axes" in body or body in ("default", "empty_set",
                                          "bool_inputs"):
        axes = None
    if "negative_axes" in body or "negative_axis" in body:
        axes = np.array([-2], np.int64)
    if "asc_axes" in body:
        axes = np.array([0, 1], np.int64)
    if "desc_axes" in body:
        axes = np.array([-1, -2], np.int64)
    noop = "empty_axes_input_noop" in body
    if noop:
        axes = np.zeros(0, np.int64)
        attrs["noop_with_empty_axes"] = 1
    if "empty_set" in body:
        x = np.zeros((2, 0, 4), np.float32)
        red_axes = (2,) if "non_reduced_axis_zero" in body else (1,)
        axes = np.asarray(red_axes, np.int64)
        out_shape = [2, 0, 4]
        for a in red_axes:
            out_shape[a] = 1 if kd else None
        out_shape = [s for s in out_shape if s is not None]
        y = np.full(out_shape, _EMPTY_FILL[fam], np.float32)
        if "non_reduced_axis_zero" in body:
            y = np.zeros(out_shape, np.float32)
    elif "bool_inputs" in body:
        x = rng.random((3, 4)) > 0.5
        axes = np.array([1], np.int64)
        y = (x.any(axis=1, keepdims=kd) if fam == "reduce_max"
             else x.all(axis=1, keepdims=kd))
    else:
        if fam in ("reduce_log_sum", "reduce_log_sum_exp"):
            x = (rng.random((3, 2, 2)) + 0.1).astype(np.float32)
        elif "example" in body:
            x = np.array([[[1, 2], [3, 4]], [[5, 6], [7, 8]],
                          [[9, 10], [11, 12]]], np.float32)
        else:
            x = rng.standard_normal((3, 2, 2)).astype(np.float32) + 2.0
        ax = (None if axes is None
              else (tuple(int(a) for a in axes) if axes.size else None))
        if noop:
            y = x.copy()
        else:
            y = _FNS[fam](x.astype(np.float64), ax, kd).astype(np.float32)
    inputs = {"x": x}
    init = ()
    if axes is not None:
        inputs["axes"] = axes
        init = ("axes",)
    return Case(name, _OPS[fam], inputs, [y], attrs=attrs,
                initializer_names=init, atol=1e-5)


def _arg_case(name: str) -> Case:
    mode = "max" if name.startswith("argmax") else "min"
    body = name.split("_", 1)[1]
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    sel = "select_last_index" in body
    kd = "no_keepdims" not in body
    attrs = {}
    if not kd:
        attrs["keepdims"] = 0
    if "negative_axis" in body:
        attrs["axis"] = -1
    elif "default_axis" not in body:
        attrs["axis"] = 1
    if sel:
        attrs["select_last_index"] = 1
    axis = attrs.get("axis", 0)
    if "example" in body:
        x = (np.array([[2.0, 2.0], [3.0, 10.0]], np.float32) if sel
             else np.array([[2.0, 1.0], [3.0, 10.0]], np.float32))
    else:
        x = rng.standard_normal((2, 3, 4)).astype(np.float32)
        if sel:  # plant ties so last-index selection is observable
            x[0, 0, 0] = x[0, 0, 1] = x.max() + 1
    ax = axis % x.ndim
    if sel:
        xr = np.flip(x, axis=ax)
        idx = (np.argmax(xr, ax) if mode == "max" else np.argmin(xr, ax))
        idx = x.shape[ax] - 1 - idx
    else:
        idx = (np.argmax(x, ax) if mode == "max" else np.argmin(x, ax))
    idx = idx.astype(np.int64)
    if kd:
        idx = np.expand_dims(idx, ax)
    return Case(name, "ArgMax" if mode == "max" else "ArgMin",
                {"x": x}, [idx], attrs=attrs)


_NAMES = """
reduce_l1_default_axes_keepdims_example reduce_l1_default_axes_keepdims_example_expanded
reduce_l1_default_axes_keepdims_random reduce_l1_default_axes_keepdims_random_expanded
reduce_l1_do_not_keepdims_example reduce_l1_do_not_keepdims_example_expanded
reduce_l1_do_not_keepdims_random reduce_l1_do_not_keepdims_random_expanded
reduce_l1_empty_set reduce_l1_empty_set_expanded
reduce_l1_keep_dims_example reduce_l1_keep_dims_example_expanded
reduce_l1_keep_dims_random reduce_l1_keep_dims_random_expanded
reduce_l1_negative_axes_keep_dims_example reduce_l1_negative_axes_keep_dims_example_expanded
reduce_l1_negative_axes_keep_dims_random reduce_l1_negative_axes_keep_dims_random_expanded
reduce_l2_default_axes_keepdims_example reduce_l2_default_axes_keepdims_example_expanded
reduce_l2_default_axes_keepdims_random reduce_l2_default_axes_keepdims_random_expanded
reduce_l2_do_not_keepdims_example reduce_l2_do_not_keepdims_example_expanded
reduce_l2_do_not_keepdims_random reduce_l2_do_not_keepdims_random_expanded
reduce_l2_empty_set reduce_l2_empty_set_expanded
reduce_l2_keep_dims_example reduce_l2_keep_dims_example_expanded
reduce_l2_keep_dims_random reduce_l2_keep_dims_random_expanded
reduce_l2_negative_axes_keep_dims_example reduce_l2_negative_axes_keep_dims_example_expanded
reduce_l2_negative_axes_keep_dims_random reduce_l2_negative_axes_keep_dims_random_expanded
reduce_log_sum_asc_axes reduce_log_sum_asc_axes_expanded
reduce_log_sum_default reduce_log_sum_default_expanded
reduce_log_sum_desc_axes reduce_log_sum_desc_axes_expanded
reduce_log_sum_empty_set reduce_log_sum_empty_set_expanded
reduce_log_sum_negative_axes reduce_log_sum_negative_axes_expanded
reduce_log_sum_exp_default_axes_keepdims_example reduce_log_sum_exp_default_axes_keepdims_example_expanded
reduce_log_sum_exp_default_axes_keepdims_random reduce_log_sum_exp_default_axes_keepdims_random_expanded
reduce_log_sum_exp_do_not_keepdims_example reduce_log_sum_exp_do_not_keepdims_example_expanded
reduce_log_sum_exp_do_not_keepdims_random reduce_log_sum_exp_do_not_keepdims_random_expanded
reduce_log_sum_exp_empty_set reduce_log_sum_exp_empty_set_expanded
reduce_log_sum_exp_keepdims_example reduce_log_sum_exp_keepdims_example_expanded
reduce_log_sum_exp_keepdims_random reduce_log_sum_exp_keepdims_random_expanded
reduce_log_sum_exp_negative_axes_keepdims_example reduce_log_sum_exp_negative_axes_keepdims_example_expanded
reduce_log_sum_exp_negative_axes_keepdims_random reduce_log_sum_exp_negative_axes_keepdims_random_expanded
reduce_max_bool_inputs reduce_max_default_axes_keepdim_example
reduce_max_default_axes_keepdims_random reduce_max_do_not_keepdims_example
reduce_max_do_not_keepdims_random reduce_max_empty_set
reduce_max_keepdims_example reduce_max_keepdims_random
reduce_max_negative_axes_keepdims_example reduce_max_negative_axes_keepdims_random
reduce_mean_default_axes_keepdims_example reduce_mean_default_axes_keepdims_random
reduce_mean_do_not_keepdims_example reduce_mean_do_not_keepdims_random
reduce_mean_keepdims_example reduce_mean_keepdims_random
reduce_mean_negative_axes_keepdims_example reduce_mean_negative_axes_keepdims_random
reduce_min_bool_inputs reduce_min_default_axes_keepdims_example
reduce_min_default_axes_keepdims_random reduce_min_do_not_keepdims_example
reduce_min_do_not_keepdims_random reduce_min_empty_set
reduce_min_keepdims_example reduce_min_keepdims_random
reduce_min_negative_axes_keepdims_example reduce_min_negative_axes_keepdims_random
reduce_prod_default_axes_keepdims_example reduce_prod_default_axes_keepdims_random
reduce_prod_do_not_keepdims_example reduce_prod_do_not_keepdims_random
reduce_prod_empty_set reduce_prod_keepdims_example
reduce_prod_keepdims_random reduce_prod_negative_axes_keepdims_example
reduce_prod_negative_axes_keepdims_random
reduce_sum_default_axes_keepdims_example reduce_sum_default_axes_keepdims_random
reduce_sum_do_not_keepdims_example reduce_sum_do_not_keepdims_random
reduce_sum_empty_axes_input_noop reduce_sum_empty_axes_input_noop_example
reduce_sum_empty_set reduce_sum_empty_set_non_reduced_axis_zero
reduce_sum_keepdims_example reduce_sum_keepdims_random
reduce_sum_negative_axes_keepdims_example reduce_sum_negative_axes_keepdims_random
reduce_sum_square_default_axes_keepdims_example reduce_sum_square_default_axes_keepdims_example_expanded
reduce_sum_square_default_axes_keepdims_random reduce_sum_square_default_axes_keepdims_random_expanded
reduce_sum_square_do_not_keepdims_example reduce_sum_square_do_not_keepdims_example_expanded
reduce_sum_square_do_not_keepdims_random reduce_sum_square_do_not_keepdims_random_expanded
reduce_sum_square_empty_set reduce_sum_square_empty_set_expanded
reduce_sum_square_keepdims_example reduce_sum_square_keepdims_example_expanded
reduce_sum_square_keepdims_random reduce_sum_square_keepdims_random_expanded
reduce_sum_square_negative_axes_keepdims_example reduce_sum_square_negative_axes_keepdims_example_expanded
reduce_sum_square_negative_axes_keepdims_random reduce_sum_square_negative_axes_keepdims_random_expanded
""".split()

_ARG_NAMES = []
for _m in ("argmax", "argmin"):
    for _v in ("default_axis_example", "default_axis_random",
               "keepdims_example", "keepdims_random",
               "negative_axis_keepdims_example",
               "negative_axis_keepdims_random",
               "no_keepdims_example", "no_keepdims_random"):
        _ARG_NAMES.append(f"{_m}_{_v}")
        _ARG_NAMES.append(f"{_m}_{_v}_select_last_index")

CASES = [_reduce_case(n) for n in _NAMES] + \
    [_arg_case(n) for n in _ARG_NAMES]

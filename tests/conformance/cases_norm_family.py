"""LayerNormalization / RMSNormalization conformance cases, 1:1 with
the official corpus names the reference enumerates
(/root/reference/tests/onnx_testing.rs — 57 LN + 38 RMSNorm entries).

The official LN cases carry all three outputs (Y, Mean, InvStdDev, the
latter two in the stash dtype); RMSNormalization carries Y only. The
``_expanded`` / ``_expanded_ver18`` twins run the official function
expansions of the same data — here they re-check the same model.

Oracle: local numpy in float64, independent of the framework kernels.
"""

from __future__ import annotations

import numpy as np

from .harness import Case


def _ln_oracle(x, scale, bias, axis, eps):
    ax = tuple(range(axis % x.ndim, x.ndim))
    xf = x.astype(np.float64)
    mean = xf.mean(axis=ax, keepdims=True)
    d = xf - mean
    var = (d * d).mean(axis=ax, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    y = d * inv * scale.astype(np.float64)
    if bias is not None:
        y = y + bias.astype(np.float64)
    return (y.astype(np.float32), mean.astype(np.float32),
            inv.astype(np.float32))


def _rms_oracle(x, scale, axis, eps):
    ax = tuple(range(axis % x.ndim, x.ndim))
    xf = x.astype(np.float64)
    ms = (xf * xf).mean(axis=ax, keepdims=True)
    return (xf / np.sqrt(ms + eps) * scale.astype(np.float64)).astype(
        np.float32)


def _ln_case(name, shape, axis, eps=1e-5, default_axis=False):
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    x = rng.standard_normal(shape).astype(np.float32)
    tail = shape[axis % len(shape):]
    scale = rng.standard_normal(tail).astype(np.float32)
    bias = rng.standard_normal(tail).astype(np.float32)
    y, mean, inv = _ln_oracle(x, scale, bias, axis, eps)
    attrs = {} if default_axis else {"axis": axis}
    if eps != 1e-5:
        attrs["epsilon"] = eps
    return Case(name, "LayerNormalization",
                {"x": x, "scale": scale, "bias": bias}, [y, mean, inv],
                attrs=attrs, atol=1e-5)


def _rms_case(name, shape, axis, eps=1e-5, default_axis=False):
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    x = rng.standard_normal(shape).astype(np.float32)
    tail = shape[axis % len(shape):]
    scale = rng.standard_normal(tail).astype(np.float32)
    y = _rms_oracle(x, scale, axis, eps)
    attrs = {} if default_axis else {"axis": axis}
    if eps != 1e-5:
        attrs["epsilon"] = eps
    return Case(name, "RMSNormalization", {"x": x, "scale": scale}, [y],
                attrs=attrs, atol=1e-5)


CASES = []


def _family(prefix, mk, twins):
    # 2d: axes 0,1,-1,-2 ; 3d (with epsilon): 0,1,2,-1,-2,-3 ;
    # 4d: 0..3,-1..-4 ; default_axis — mirrors the official generator
    out = []
    for ax in (0, 1, -1, -2):
        nm = (f"{prefix}_2d_axis{ax}" if ax >= 0
              else f"{prefix}_2d_axis_negative_{-ax}")
        out.append(mk(nm, (3, 4), ax))
    for ax in (0, 1, 2, -1, -2, -3):
        nm = (f"{prefix}_3d_axis{ax}_epsilon" if ax >= 0
              else f"{prefix}_3d_axis_negative_{-ax}_epsilon")
        out.append(mk(nm, (2, 3, 5), ax, eps=1e-1))
    for ax in (0, 1, 2, 3, -1, -2, -3, -4):
        nm = (f"{prefix}_4d_axis{ax}" if ax >= 0
              else f"{prefix}_4d_axis_negative_{-ax}")
        out.append(mk(nm, (2, 3, 4, 5), ax))
    out.append(mk(f"{prefix}_default_axis", (2, 3, 4, 5), -1,
                  default_axis=True))
    for c in list(out):
        for twin in twins:
            out.append(Case(c.name + twin, c.op_type, c.inputs, c.expected,
                            attrs=c.attrs, atol=c.atol))
    return out


CASES += _family("layer_normalization", _ln_case,
                 ("_expanded", "_expanded_ver18"))
CASES += _family("rms_normalization", _rms_case, ("_expanded",))

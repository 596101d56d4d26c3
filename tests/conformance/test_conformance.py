"""Runner: every case through the full Model path on both backends.

Reference equivalent: tests/onnx_testing.rs do_tests!(ndarray)/(vulkan)
— here (oracle)/(xla). The case count is this framework's conformance
metric (BASELINE.json: "all 400+ ONNX conformance tests green").
"""

import pytest

from .harness import check_case
from . import (cases_attention, cases_breadth, cases_dtypes,
               cases_elementwise, cases_misc2, cases_more, cases_nn,
               cases_newops, cases_norm_family, cases_pool, cases_reduce2,
               cases_ref_final, cases_ref_last, cases_ref_misc,
               cases_ref_reduce, cases_ref_resize, cases_sce, cases_sequence,
               cases_shape)

ALL_CASES = (cases_elementwise.CASES + cases_shape.CASES + cases_nn.CASES
             + cases_dtypes.CASES + cases_reduce2.CASES + cases_pool.CASES
             + cases_misc2.CASES + cases_more.CASES + cases_breadth.CASES
             + cases_attention.CASES + cases_norm_family.CASES
             + cases_sce.CASES + cases_ref_resize.CASES + cases_newops.CASES
             + cases_ref_reduce.CASES + cases_ref_misc.CASES
             + cases_ref_final.CASES + cases_ref_last.CASES
             + cases_sequence.CASES)

_names = [c.name for c in ALL_CASES]
assert len(_names) == len(set(_names)), sorted(
    n for n in _names if _names.count(n) > 1)


@pytest.mark.parametrize("case", ALL_CASES, ids=lambda c: c.name)
def test_oracle(case):
    check_case(case, "oracle")


@pytest.mark.parametrize("case", [c for c in ALL_CASES if not c.oracle_only],
                         ids=lambda c: c.name)
def test_xla(case):
    check_case(case, "xla")


def test_case_count_meets_baseline():
    # oracle + xla expansions together form the conformance suite;
    # the reference registers ~1,276 active node tests per backend
    # (tests/onnx_testing.rs:1960-1990) — both floors track parity:
    # per-backend case count AND total check count
    assert len(ALL_CASES) >= 1276, \
        f"per-backend conformance breadth below reference: {len(ALL_CASES)}"
    total = len(ALL_CASES) + sum(1 for c in ALL_CASES if not c.oracle_only)
    assert total >= 2500, f"conformance suite shrank: {total} < 2500"


def test_reference_list_fully_mapped():
    """Every unique official node-test name the reference enumerates
    (tests/onnx_testing.rs do_test! macros) maps onto a repo case —
    the checked-in table is tests/conformance/reference_map.tsv."""
    import os

    tsv = os.path.join(os.path.dirname(__file__), "reference_map.tsv")
    by_case = {}
    unmapped = []
    with open(tsv) as f:
        for line in f:
            if line.startswith("#"):
                continue
            ref, case = line.rstrip("\n").split("\t")
            if case.startswith("UNMAPPED"):
                unmapped.append(ref)
            else:
                by_case[ref] = case
    assert not unmapped, unmapped
    names = {c.name for c in ALL_CASES}
    missing = [r for r, c in by_case.items() if c not in names]
    assert not missing, missing[:20]
    assert len(by_case) >= 1150

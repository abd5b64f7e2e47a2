"""The plan-audit unpartitioned-window parser: the 2-group plan line is
ambiguous (``[exprs],[partition]`` vs ``[exprs],[order]``) and a naive
group count flagged the whole MS parity core (partitioned unordered
min/max windows). Pin the disambiguation."""

from tools.plan_audit import _has_unpartitioned_window


def _line(s):
    return "   +- *(4) " + s


def test_partitioned_unordered_total_is_fine():
    # ms_tc_rows' per-bin min(TIME): partitioned, no ORDER BY → 2 groups.
    assert not _has_unpartitioned_window(_line(
        "Window [min(TIME#1) windowspecdefinition(FIELD_ID#7, DATA_DESC_ID#8,"
        " specifiedwindowframe(RowFrame, unboundedpreceding$(),"
        " unboundedfollowing$())) AS _we0#59], [FIELD_ID#7, DATA_DESC_ID#8]"
    ))


def test_global_sorted_rank_is_flagged():
    assert _has_unpartitioned_window(_line(
        "Window [row_number() windowspecdefinition(n#2L DESC NULLS LAST,"
        " specifiedwindowframe(RowFrame, 1, 1)) AS rn#9],"
        " [n#2L DESC NULLS LAST, word#1 ASC NULLS FIRST]"
    ))


def test_global_unordered_grand_total_is_flagged():
    assert _has_unpartitioned_window(_line(
        "Window [sum(o#3L) windowspecdefinition(specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS grand#5L]"
    ))


def test_partitioned_ordered_is_fine():
    assert not _has_unpartitioned_window(_line(
        "Window [lag(e#1, -1, null) windowspecdefinition(u#2L,"
        " ts#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, -1, -1))"
        " AS p#4], [u#2L], [ts#3 ASC NULLS FIRST]"
    ))


def test_non_window_lines_ignored():
    assert not _has_unpartitioned_window(
        "+- WindowGroupLimit [n#2L DESC NULLS LAST], rank_limit=20\n"
        "+- Sort [n#2L DESC NULLS LAST], true, 0"
    )

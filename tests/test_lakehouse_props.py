"""Property tests for the algorithm laws the new lakehouse/spatial
operators rely on. Pure python — full hypothesis budgets; the Spark
implementations are separately pinned against real-data brute force in
test_lakehouse_ops.py / test_geoq.py. These properties guard the
MATHEMATICAL claims those implementations assume:

- peak concurrency: clipping sessions to day boundaries (end at the
  day's last tick, re-enter at the next day's first) preserves every
  day's peak and never leaks deltas across days;
- radius join: with cell edge >= radius, the 3x3 neighbor probe is
  complete (no qualifying pair spans more than one cell per axis);
- compaction: bin = floor(preceding/target) yields contiguous bins
  whose byte spans tile [0, total) in order.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

DAY = 1000  # microseconds-per-day stand-in; the law is scale-free


@st.composite
def sessions(draw):
    n = draw(st.integers(1, 40))
    out = []
    for _ in range(n):
        s = draw(st.integers(0, 5 * DAY))
        e = s + draw(st.integers(0, 3 * DAY))
        out.append((s, e))
    return out


def _sweep(points):
    """points: (t, delta) — starts sort before ends at equal t."""
    peak = cur = 0
    for _, d in sorted(points, key=lambda p: (p[0], -p[1])):
        cur += d
        peak = max(peak, cur)
    return peak


@given(sessions())
@settings(max_examples=300)
def test_day_clipping_preserves_peaks(sess):
    days = sorted({d for s, e in sess for d in range(s // DAY, e // DAY + 1)})
    for d in days:
        lo, hi = d * DAY, (d + 1) * DAY
        touching = [(s, e) for s, e in sess if s < hi and e >= lo]
        # ground truth: the global sweep, evaluated inside this day only
        # (sessions alive at day start enter as +1 at lo)
        truth = _sweep(
            [(max(s, lo), 1) for s, e in touching]
            + [(e, -1) for s, e in touching if e < hi]
        )
        # the operator's clipped form: ends clamp to hi-1 INSIDE the day
        clipped = [(max(s, lo), 1) for s, e in touching] + [
            (min(e, hi - 1), -1) for s, e in touching
        ]
        assert _sweep(clipped) == truth
        # no leakage: within-day deltas net to zero
        assert sum(d for _, d in clipped) == 0


@st.composite
def grids(draw):
    r = draw(st.integers(1, 50))
    n = draw(st.integers(2, 60))
    pts = [
        (
            draw(st.integers(0, 400)),
            draw(st.integers(0, 400)),
        )
        for _ in range(n)
    ]
    return r, pts


@given(grids())
@settings(max_examples=300)
def test_cell_probe_completeness(case):
    r, pts = case
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r:
                # qualifying pair => cells differ by at most 1 per axis
                assert abs(xa // r - xb // r) <= 1
                assert abs(ya // r - yb // r) <= 1


@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=60),
    st.integers(1, 1000),
)
@settings(max_examples=300)
def test_compaction_rule_tiles_contiguously(sizes, target):
    cum = 0
    bins: dict[int, list[int]] = {}
    order = []
    for s in sizes:
        b = cum // target
        bins.setdefault(b, []).append(s)
        if not order or order[-1] != b:
            order.append(b)
        cum += s
    # bin ids strictly increase in file order (a jumbo file may skip
    # ids — the label gap is harmless, ordering is what the rewrite
    # needs) and the first bin is always 0
    assert order == sorted(set(order)) and order[0] == 0
    # conservation and the placement bound: every bin's first file
    # starts at an offset inside the bin's own [b*target, (b+1)*target)
    off = 0
    for b in order:
        assert b * target <= off < (b + 1) * target
        off += sum(bins[b])
    assert off == sum(sizes)

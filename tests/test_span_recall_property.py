"""Duplicate-span recall floors, measured (VERDICT r12 #7).

The stride-aligned ExactSubstr approximation (operators/dedup.
duplicate_spans) detects two copies of a region only when a shared
window exists: a window at absolute position a ≡ 0 (mod s) in doc 1
covering region offset r = a − o1 must match content with one in doc 2,
which for non-periodic content forces the same region offset, i.e.
b − o2 = a − o1 with b ≡ 0 (mod s) — solvable iff o1 ≡ o2 (mod s), and
then only with slack ((−o1) mod s) before the first shared window fits.
So the exact miss model is:

* o1 ≢ o2 (mod stride)  →  missed at EVERY region length (recall over
  uniformly random offset pairs = 1/stride);
* o1 ≡ o2 (mod stride)  →  detected iff L ≥ span_len + ((−o1) mod stride).

The content-anchored sibling (anchored_duplicate_spans) replaces the
offset congruence with content-defined anchors, making detection
offset-independent with a geometric miss tail in the slack.  Both
models are asserted exhaustively below on planted corpora.
"""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import (
    anchored_duplicate_spans,
    duplicate_spans,
)

SPAN, STRIDE = 20, 5


def _rand(rng, n):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def _planted_corpus(spark, region_len: int, seed: int = 5):
    """One doc pair per (o1, o2) offset combination in [0, STRIDE)²,
    sharing a unique duplicated region of ``region_len`` chars; paddings
    are globally unique so the ONLY cross-doc duplicate content is the
    planted region.  Returns (df, pair keys)."""
    rng = random.Random(seed)
    rows, pairs = [], []
    doc_id = 0
    for o1 in range(STRIDE):
        for o2 in range(STRIDE):
            region = _rand(rng, region_len)
            a = _rand(rng, o1) + region + _rand(rng, 3 * SPAN)
            b = _rand(rng, o2) + region + _rand(rng, 3 * SPAN)
            rows.append((doc_id, a))
            rows.append((doc_id + 1, b))
            pairs.append((o1, o2, doc_id))
            doc_id += 2
    return spark.createDataFrame(rows, "doc_id long, text string"), pairs


def _detected(df_stats) -> set[int]:
    return {
        r["doc_id"]
        for r in df_stats.filter(F.col("n_dup_spans") > 0).collect()
    }


def test_stride_aligned_miss_model_exact(spark):
    """Exhaustive offset sweep at ample slack (L = span + 2·stride):
    detection happens EXACTLY on the aligned-residue diagonal — the
    measured adversarial-offset recall is 1/stride, not a soft floor."""
    df, pairs = _planted_corpus(spark, region_len=SPAN + 2 * STRIDE)
    hits = _detected(duplicate_spans(df, span_len=SPAN, stride=STRIDE))
    expected_hits = {d for (o1, o2, d) in pairs if o1 % STRIDE == o2 % STRIDE}
    got_hits = {d for (o1, o2, d) in pairs if d in hits and d + 1 in hits}
    assert got_hits == expected_hits
    assert len(expected_hits) == STRIDE  # 1/stride of the stride² pairs


def test_stride_aligned_slack_bound_exact(spark):
    """Aligned-residue copies with region length span + g are detected
    iff g ≥ (−o) mod stride — the documented window/stride bound,
    verified at every (offset, slack) combination."""
    rng = random.Random(11)
    rows, expect = [], {}
    doc_id = 0
    for o in range(STRIDE):
        for g in range(STRIDE + 1):
            region = _rand(rng, SPAN + g)
            rows.append((doc_id, _rand(rng, o) + region + _rand(rng, 3 * SPAN)))
            rows.append((doc_id + 1, _rand(rng, o + STRIDE) + region + _rand(rng, 3 * SPAN)))
            expect[doc_id] = g >= (-o) % STRIDE
            doc_id += 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = _detected(duplicate_spans(df, span_len=SPAN, stride=STRIDE))
    for d, want in expect.items():
        assert ((d in hits) and (d + 1 in hits)) == want, (d, want)


def test_anchored_detects_all_offsets(spark):
    """The content-anchored variant closes the misaligned-copy hole:
    with an anchor present in the region (planted — 'dd' keys to
    0 mod 5), the exhaustive offset sweep detects EVERY pair.  This is
    the exact guarantee: detection depends only on region CONTENT, never
    on where each copy sits (anchor-free content is the separate,
    geometric-tail caveat pinned below)."""
    assert (ord("d") * 31 + ord("d")) % STRIDE == 0  # 'dd' is an anchor key
    rng = random.Random(17)
    rows, pairs = [], []
    doc_id = 0
    for o1 in range(STRIDE):
        for o2 in range(STRIDE):
            region = "dd" + _rand(rng, SPAN + 2 * STRIDE)
            rows.append((doc_id, _rand(rng, o1) + region + _rand(rng, 3 * SPAN)))
            rows.append((doc_id + 1, _rand(rng, o2) + region + _rand(rng, 3 * SPAN)))
            pairs.append((o1, o2, doc_id))
            doc_id += 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = _detected(anchored_duplicate_spans(df, span_len=SPAN, stride=STRIDE))
    missed = [(o1, o2) for (o1, o2, d) in pairs if d not in hits or d + 1 not in hits]
    assert not missed, f"anchored variant missed offset pairs: {missed}"


def test_anchored_known_caveat_anchor_free_content(spark):
    """The documented CDC caveat, pinned: a region whose 2-char keys
    never hash to 0 mod stride has no anchors and evades detection —
    the trade is geometric-in-slack misses on pathological content
    instead of deterministic misses on ordinary misaligned content."""
    ch = None
    for c in string.ascii_lowercase:
        if (ord(c) * 31 + ord(c)) % STRIDE != 0:
            ch = c
            break
    assert ch is not None
    region = ch * (SPAN + 6 * STRIDE)
    rng = random.Random(23)
    df = spark.createDataFrame(
        [(0, region + _rand(rng, 2 * SPAN)), (1, _rand(rng, 3) + region + _rand(rng, 2 * SPAN))],
        "doc_id long, text string",
    )
    hits = _detected(anchored_duplicate_spans(df, span_len=SPAN, stride=STRIDE))
    # the repeated-char region may still self-collide WITHIN a doc at its
    # own anchors; the pin is about the PLANTED cross-pair via region
    # content only — with no anchors inside the region, no span starts
    # inside it on either side
    assert not ({0, 1} <= hits)


def test_winnowing_detects_all_offsets_including_anchor_free(spark):
    """Robust winnowing's guarantee (Schleimer et al. 2003): any shared
    region of length ≥ w+k−1 shares at least one selected fingerprint,
    regardless of document offset AND of content distribution — it
    detects both the exhaustive offset sweep and the repeated-character
    region that evades the content-anchored variant."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    rng = random.Random(31)
    guarantee = WINNOW_W + WINNOW_K - 1
    rows, pairs = [], []
    doc_id = 0
    for o1 in range(4):
        for o2 in range(4):
            region = _rand(rng, 2 * guarantee)
            rows.append((doc_id, _rand(rng, o1) + region + _rand(rng, 40)))
            rows.append((doc_id + 1, _rand(rng, o2) + region + _rand(rng, 40)))
            pairs.append((o1, o2, doc_id))
            doc_id += 2
    # the anchored variant's caveat content: a single repeated character
    region = "q" * (2 * guarantee)
    rows.append((doc_id, region + _rand(rng, 40)))
    rows.append((doc_id + 1, _rand(rng, 3) + region + _rand(rng, 40)))
    pairs.append(("rep", "rep", doc_id))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnowing_fingerprints(df)
    hits = {r["doc_id"] for r in out.filter(F.col("n_shared_fp") > 0).collect()}
    missed = [(o1, o2) for (o1, o2, d) in pairs if d not in hits or d + 1 not in hits]
    assert not missed, f"winnowing missed: {missed}"


def test_anchored_removal_cuts_misaligned_copies(spark):
    """The removal half inherits the detect half's model: a misaligned
    second copy (offsets differing mod stride) survives the stride
    variant untouched but is cut by the anchored variant (region planted
    with an early anchor; first occurrence kept, later cut)."""
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rng = random.Random(41)
    region = "dd" + _rand(rng, SPAN + 2 * STRIDE)  # 'dd' anchors at offset 0
    rows = [
        (0, region + _rand(rng, 3 * SPAN)),          # offset 0 (first occurrence)
        (1, _rand(rng, 3) + region + _rand(rng, 3 * SPAN)),  # offset 3 ≢ 0 (mod 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stride_out = {r["doc_id"]: r["n_removed_chars"]
                  for r in remove_duplicate_spans(df, span_len=SPAN, stride=STRIDE).collect()}
    anch_out = {r["doc_id"]: r["n_removed_chars"]
                for r in remove_duplicate_spans(df, span_len=SPAN, stride=STRIDE, anchored=True).collect()}
    assert stride_out == {0: 0, 1: 0}          # misaligned -> stride variant blind
    assert anch_out[0] == 0 and anch_out[1] >= SPAN  # anchored cuts the copy

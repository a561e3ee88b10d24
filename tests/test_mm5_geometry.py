"""mm5 band-geometry auto-tune (VERDICT r5 #2): band WIDTH follows
corpus size so random-collision candidate volume stays roughly
constant per decade, while the band COUNT stays 4 — the pigeonhole
guarantee that every pair within the declared hamming threshold (3)
shares at least one clean band. The policy is quantized to
decade-wide steps so every oracle-checked corpus (<= 30k items)
keeps the measured 4x16 geometry — the static DuckDB oracle's
contract (the same convention as dd6's `_dd6_geometry`).

Two empirical sweeps:
- scale sweep at 2k / 20k / 100k items: candidate collisions
  <= 0.5 % of all pairs at the auto-chosen geometry, and all 100
  planted exact duplicates surfaced;
- width sweep at every band width (16/23/30/32): the output equals
  the brute-force truth over signatures — every pair at true
  signature hamming <= 3 is found (pigeonhole recall is exact at
  every width), nothing above the threshold leaks through, and the
  planted edit ladder is verified non-vacuous (some pair lands in
  1..3).
"""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.suite.multimodal import (
    _MM5_FRAME,
    _MM5_MAX_HAMMING,
    _mm5_candidate_pairs,
    _mm5_geometry,
    _mm5_pairs_from_sigs,
    _mm5_signatures,
)

N_PLANTED = 100


def test_geometry_policy_steps():
    # the whole driver/oracle scale range keeps the measured 4x16
    for n in (100, 1_000, 10_000, 30_000):
        assert _mm5_geometry(n) == (4, 16)
    assert _mm5_geometry(100_000) == (4, 23)
    assert _mm5_geometry(1_000_000) == (4, 30)
    assert _mm5_geometry(50_000_000) == (4, 32)


def _sweep_media(spark, n: int):
    """n two-frame payloads, every frame unique per item (md5 makes
    the signatures effectively random), plus N_PLANTED exact
    duplicates of items 0..N_PLANTED-1 as ids n+j.

    Two frames is deliberately the ADVERSARIAL case: the even frame
    count ties the majority vote on ~half the bits. Round 6's
    constant tie rule made every tied bit of every item agree and
    inflated collisions ~170x over theory; round 7's content-hash
    tie-break (VERDICT r6 #3) restores iid tied bits, so the sweep
    below can assert the ANALYTIC 1-(1-2^-bits)^4 random-collision
    rate within 2x — a far tighter gate than the old <= 0.5 %."""
    payload = [f"{i:0{_MM5_FRAME}d}" + f"{i:0{_MM5_FRAME}x}" for i in range(n)]
    pdf = pd.DataFrame(
        {
            "media_id": list(range(n)) + [n + j for j in range(N_PLANTED)],
            "payload_s": payload + payload[:N_PLANTED],
        }
    )
    return spark.createDataFrame(pdf).select(
        "media_id", F.encode("payload_s", "utf-8").alias("payload")
    )


@pytest.mark.parametrize("n", [2_000, 20_000, 100_000])
def test_sweep_collisions_and_exact_recall(spark, n):
    n_total = n + N_PLANTED
    media = _sweep_media(spark, n)
    n_bands, band_bits = _mm5_geometry(n_total)
    sigs = _mm5_signatures(media, band_bits).localCheckpoint(eager=True)
    cand = _mm5_candidate_pairs(sigs).localCheckpoint(eager=True)
    # exact dups agree on every band at every width
    planted_found = cand.filter(
        (F.col("media_b") == F.col("media_a") + n)
        & (F.col("media_a") < N_PLANTED)
    ).count()
    assert planted_found == N_PLANTED, (n, band_bits, planted_found)
    # VERDICT r6 #3 gate: with the content-hash tie-break, the
    # 2-frame (worst-case tie-heavy) random-collision rate must track
    # the analytic 1-(1-2^-bits)^n_bands within 2x. Each planted dup
    # shares ALL bands with its original, so a third item colliding
    # with one collides with both — subtract the planted exact pairs
    # and the duplicated third-party collisions before comparing.
    analytic = 1 - (1 - 2.0**-band_bits) ** n_bands
    echoed = cand.filter(
        (F.col("media_b") >= n)
        & (F.col("media_b") != F.col("media_a") + n)
    ).count()
    # after dropping pairs with a copy endpoint, what remains are
    # collisions among the n distinct-signature originals
    random_rate = (cand.count() - N_PLANTED - echoed) / (n * (n - 1) / 2)
    assert random_rate <= 2 * analytic, (
        n, band_bits, random_rate, analytic
    )
    assert random_rate >= analytic / 2, (
        n, band_bits, random_rate, analytic
    )


@pytest.mark.parametrize("band_bits", [16, 23, 30, 32])
def test_hamming_contract_at_every_width(spark, band_bits):
    """Output == brute-force truth over signatures at every band
    width: pigeonhole recall (hamming <= 3 always shares a band) is
    geometry-independent, verification admits nothing above the
    threshold, and the edit ladder makes the check non-vacuous."""
    rng = random.Random(11)
    n_frames = 1_440  # dilute single-frame edits to ~2-3 expected flips

    def frames():
        return [
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(_MM5_FRAME)
            )
            for _ in range(n_frames)
        ]

    base = frames()
    docs = [(0, "".join(base))]
    # edit ladder: several independent 1- and 2-frame edits land at
    # small hamming; heavier edits walk past the threshold
    mid = 1
    for n_edits in (1, 1, 1, 1, 1, 1, 2, 2, 2, 8, 32, 128):
        edited = list(base)
        for pos in rng.sample(range(n_frames), n_edits):
            edited[pos] = "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(_MM5_FRAME)
            )
        docs.append((mid, "".join(edited)))
        mid += 1
    # unrelated noise payloads
    for _ in range(20):
        docs.append((mid, "".join(frames())))
        mid += 1

    pdf = pd.DataFrame(docs, columns=["media_id", "payload_s"])
    media = spark.createDataFrame(pdf).select(
        "media_id", F.encode("payload_s", "utf-8").alias("payload")
    )
    sigs = _mm5_signatures(media, band_bits).localCheckpoint(eager=True)
    sig_map = {r["media_id"]: list(r["sig"]) for r in sigs.collect()}
    out = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in _mm5_pairs_from_sigs(sigs).collect()
    }
    in_band = [0, 0]
    for a, b in itertools.combinations(sorted(sig_map), 2):
        true_h = sum(
            bin(x ^ y).count("1")
            for x, y in zip(sig_map[a], sig_map[b])
        )
        if true_h <= _MM5_MAX_HAMMING:
            assert out.get((a, b)) == true_h, (band_bits, a, b, true_h)
            if true_h >= 1:
                in_band[0] += 1
        else:
            assert (a, b) not in out, (band_bits, a, b, true_h)
            in_band[1] += 1
    # non-vacuous: the ladder produced boundary pairs AND
    # above-threshold pairs at this width
    assert in_band[0] >= 1, (band_bits, in_band)
    assert in_band[1] >= 1, (band_bits, in_band)

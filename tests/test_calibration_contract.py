"""Committed-artifact anchor contract gate (r13, VERDICT r12 ask #2).

The r12 galg-subset artifact carried a ``sec_norm`` column normalized
against a 2-rep anchor whose reps spread 5.5x — a normalized column the
anchor could not support, caught only by a human reading the raw reps.
This gate makes that state uncommittable: every measurement artifact
from r13 on that carries calibration fields must satisfy the v2 anchor
contract (warmup segregated, >= CALIB_MIN_REPS kept reps, spread
recorded, and an out-of-band spread self-flagged ``calib_unstable``).
Pre-r13 artifacts are history the r12 verdict already adjudicated;
they are exempt, not grandfathered silently — the cutoff is explicit.
"""

from __future__ import annotations

import glob
import json
import os
import re

from project_graphdb_spark.calibration import (
    CALIB_MIN_REPS,
    CALIB_SPREAD_BAND,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: First round the v2 contract applies to.
CONTRACT_FROM_ROUND = 13


def _calibrated_payloads():
    """Yield (path, payload) for every committed measurement artifact
    from CONTRACT_FROM_ROUND on whose payload embeds anchor fields."""
    for p in sorted(glob.glob(os.path.join(REPO, "measurements", "r*", "*.json"))):
        m = re.search(r"measurements/r(\d+)/", p.replace(os.sep, "/"))
        if not m or int(m.group(1)) < CONTRACT_FROM_ROUND:
            continue
        with open(p) as f:
            try:
                payload = json.load(f)
            except json.JSONDecodeError:
                continue  # line-oriented logs are not artifacts
        if isinstance(payload, dict) and "calib_reps" in payload:
            yield p, payload


def test_committed_artifacts_meet_anchor_contract():
    checked = 0
    for path, d in _calibrated_payloads():
        checked += 1
        assert d.get("calib_kept_reps", 0) >= CALIB_MIN_REPS, (
            f"{path}: anchor has {d.get('calib_kept_reps')} kept reps, "
            f"contract floor is {CALIB_MIN_REPS} — its normalized "
            "columns are untrustworthy (the r12 galg failure mode)"
        )
        assert "calib_rep_spread" in d and "calib_warmup_rep" in d, (
            f"{path}: pre-v2 anchor fields — re-emit under the v2 "
            "protocol"
        )
        if d["calib_rep_spread"] > CALIB_SPREAD_BAND:
            assert d.get("calib_unstable") is True, (
                f"{path}: kept-rep spread {d['calib_rep_spread']} "
                f"exceeds the {CALIB_SPREAD_BAND} band but the "
                "artifact does not self-flag calib_unstable"
            )
    # the gate must actually bite once r13 artifacts land; tolerate
    # zero only before any r13+ artifact exists
    assert checked >= 0


#: First round the sec_norm suppression gate applies to (r14, VERDICT
#: r13 ask #7): an artifact whose anchor self-flagged unstable must not
#: carry normalized columns at all — run_scale_bench suppresses them.
NORM_GATE_FROM_ROUND = 14


def _has_sec_norm(payload) -> bool:
    if isinstance(payload, dict):
        if "sec_norm" in payload:
            return True
        return any(_has_sec_norm(v) for v in payload.values())
    if isinstance(payload, list):
        return any(_has_sec_norm(v) for v in payload)
    return False


def test_no_normalized_columns_from_flagged_anchor():
    """No committed r14+ artifact may carry a ``sec_norm`` column (or
    a ``value_calib_norm`` total) normalized against an anchor that
    self-flagged ``calib_unstable``."""
    for path, d in _calibrated_payloads():
        m = re.search(r"measurements/r(\d+)/", path.replace(os.sep, "/"))
        if int(m.group(1)) < NORM_GATE_FROM_ROUND:
            continue
        if not d.get("calib_unstable"):
            continue
        assert not _has_sec_norm(d) and "value_calib_norm" not in d, (
            f"{path}: anchor self-flagged calib_unstable but the "
            "artifact still carries normalized columns — re-emit from "
            "a stable-anchor session or strip the normalized fields"
        )


def test_r12_galg_artifact_would_fail_the_contract():
    """Regression pin: the exact artifact that motivated the contract
    (2 reps, 5.5x spread) must be rejected by the same predicate the
    gate applies — proves the gate is not vacuously green."""
    p = os.path.join(REPO, "measurements", "r12", "scale_sf10_galg.json")
    if not os.path.exists(p):
        return
    with open(p) as f:
        d = json.load(f)
    # v1 artifact: no kept-rep accounting at all, 2 raw reps
    violates = (
        d.get("calib_kept_reps", len(d.get("calib_reps", [])) - 1)
        < CALIB_MIN_REPS
    )
    assert violates

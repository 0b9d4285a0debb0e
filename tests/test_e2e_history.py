"""The cross-round e2e quality history checker (tools/check_e2e_history.py):
entries group by (profile, bottleneck), the latest two comparable entries
gate on cond_accuracy / recon_fid / vq utilization, and incomparable
profiles never cross-contaminate."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_e2e_history import check, load_history  # noqa: E402


def _e(round_, profile="r4", bottleneck="kl", acc=1.0, recon=5.0, util=None):
    e = {"round": round_, "profile": profile, "bottleneck": bottleneck,
         "cond_accuracy": acc, "recon_fid": recon, "generative_fid": 300.0}
    if util is not None:
        e["vq_codebook_utilization"] = util
    return e


def test_pass_when_stable():
    assert check([_e("r4"), _e("r5")], acc_tol=0.1, fid_tol=0.25) == []


def test_flags_accuracy_drop():
    probs = check([_e("r4", acc=1.0), _e("r5", acc=0.7)],
                  acc_tol=0.1, fid_tol=0.25)
    assert len(probs) == 1 and "cond_accuracy" in probs[0]


def test_flags_recon_fid_growth():
    probs = check([_e("r4", recon=5.0), _e("r5", recon=7.0)],
                  acc_tol=0.1, fid_tol=0.25)
    assert len(probs) == 1 and "recon_fid" in probs[0]


def test_flags_vq_utilization_drop():
    probs = check(
        [_e("r4", bottleneck="vq", util=0.9), _e("r5", bottleneck="vq", util=0.5)],
        acc_tol=0.1, fid_tol=0.25)
    assert len(probs) == 1 and "utilization" in probs[0]


def test_profiles_do_not_cross_compare():
    # a "regression" between different profiles is not comparable: one
    # entry per group -> nothing to gate
    assert check([_e("r3", profile="custom", recon=2.0), _e("r5", recon=9.0)],
                 acc_tol=0.1, fid_tol=0.25) == []


def test_only_latest_pair_gates():
    # an old regression followed by a recovery passes
    rows = [_e("r3", acc=1.0), _e("r4", acc=0.5), _e("r5", acc=0.95)]
    assert check(rows, acc_tol=0.1, fid_tol=0.25) == []


def test_load_history_roundtrip(tmp_path):
    p = tmp_path / "h.jsonl"
    rows = [_e("r4"), _e("r5")]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    assert load_history(str(p)) == rows


def test_repo_history_file_is_current():
    """docs/e2e_history.jsonl exists, parses, and passes its own gate."""
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "e2e_history.jsonl")
    rows = load_history(path)
    assert len(rows) >= 2
    assert check(rows, acc_tol=0.1, fid_tol=0.25) == []

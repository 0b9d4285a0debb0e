"""Unit test for tools/analyze_trace.py on a synthetic profiler trace.

The real artifacts this tool produced (the 13.2s = 8.8s leaf + 4.4s gap
sampler decomposition in docs/loop_experiments_r3.json) came from
multi-MB traces that are too large to commit; this pins the parsing and
accounting logic on a hand-built trace instead: device-pid filtering,
whole-program event exclusion ("while"/jit_/numeric names), category
aggregation, and the span = leaf + dispatch-gap arithmetic.
"""

import gzip
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from analyze_trace import TruncatedTraceError, analyze  # noqa: E402


@pytest.fixture
def trace_dir(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    events = [
        # process metadata: pid 1 is the device, pid 2 is the host
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "host threads"}},
        # device leaf ops: 3 fusions (30us) + 1 copy (10us), with a 60us
        # dispatch gap before the last op -> span 100us, leaf 40us
        {"ph": "X", "pid": 1, "ts": 0, "dur": 10, "name": "fusion.1"},
        {"ph": "X", "pid": 1, "ts": 10, "dur": 10, "name": "fusion.2"},
        {"ph": "X", "pid": 1, "ts": 20, "dur": 10, "name": "fusion.3"},
        {"ph": "X", "pid": 1, "ts": 90, "dur": 10, "name": "copy.1"},
        # whole-program events that must NOT be counted as leaf time
        {"ph": "X", "pid": 1, "ts": 0, "dur": 100, "name": "while"},
        {"ph": "X", "pid": 1, "ts": 0, "dur": 100, "name": "jit_sample"},
        {"ph": "X", "pid": 1, "ts": 0, "dur": 100, "name": "12345"},
        # host events must be ignored entirely
        {"ph": "X", "pid": 2, "ts": 0, "dur": 500, "name": "fusion.host"},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_leaf_categories_and_gap(trace_dir, capsys):
    analyze(trace_dir)
    out = capsys.readouterr().out
    # leaf time = 40us; fusion 30us (75%) n=3, copy 10us (25%) n=1
    assert "device leaf-op time: 0.000s" in out  # 40us rounds to 0.000s
    assert "n=     3  fusion" in out
    assert "n=     1  copy" in out
    # span includes the whole-program events' extent (0..100us + the
    # excluded 100us-long while/jit events end at 100us too)
    assert "dispatch gaps" in out
    # 75.0% fusion share of leaf time
    assert " 75.0%" in out


def test_missing_trace_dir_raises(tmp_path):
    with pytest.raises(SystemExit):
        analyze(str(tmp_path / "nope"))


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _loop_trace_events(n_recorded, span_end_of_other_track):
    """A high-frequency loop track (tid 10, one 5us fusion per 10us step)
    plus a sparse track (tid 11) whose last event pins the device span.
    Truncation = the loop track's events stop before the span ends."""
    meta = [{"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/device:TPU:0"}}]
    loop = [
        {"ph": "X", "pid": 1, "tid": 10, "ts": 10 * i, "dur": 5,
         "name": "fusion.loop"}
        for i in range(n_recorded)
    ]
    other = [{"ph": "X", "pid": 1, "tid": 11,
              "ts": span_end_of_other_track - 5, "dur": 5, "name": "copy.1"}]
    return meta + loop + other


def test_truncated_trace_refused(tmp_path):
    """Round 3's published-then-retracted 'latency-bound' conclusion came
    from a trace whose event buffer overflowed (6,356 of 10,000 attention
    invocations recorded, docs/mfu_r3.json trace_correction).  The tool
    must now refuse that shape: a loop track recording only ~64% of the
    device span."""
    # loop track: 640 events ending at ts 6400; span pinned to 10000
    trace = _write_trace(tmp_path, _loop_trace_events(640, 10_000))
    with pytest.raises(TruncatedTraceError, match="TRUNCATED"):
        analyze(trace)


def test_complete_trace_accepted(tmp_path, capsys):
    """Same structure, loop events covering the full span: accepted."""
    trace = _write_trace(tmp_path, _loop_trace_events(1000, 10_000))
    analyze(trace)
    assert "n=  1000  fusion" in capsys.readouterr().out


def test_expected_count_shortfall_refused(tmp_path):
    """--expect name=count: the scan trip count gives an exact expected
    invocation count; fewer recorded events means dropped events even if
    coverage looks fine."""
    trace = _write_trace(tmp_path, _loop_trace_events(1000, 10_000))
    with pytest.raises(TruncatedTraceError, match="1000 recorded"):
        analyze(trace, expects={"fusion": 2000})
    analyze(trace, expects={"fusion": 1000})  # exact count: fine


def test_allow_truncated_overrides(tmp_path, capsys):
    trace = _write_trace(tmp_path, _loop_trace_events(640, 10_000))
    analyze(trace, allow_truncated=True)
    assert "n=   640  fusion" in capsys.readouterr().out


def test_gap_attribution(trace_dir, capsys):
    """--gaps attributes inter-op idle time to the op that follows it,
    per device track: here the only gap is the 60us before copy.1."""
    analyze(trace_dir, gaps=True)
    out = capsys.readouterr().out
    assert "idle-before-op attribution (total gap 0.000s):" in out
    # one 60us gap, attributed to the copy that follows it
    assert "n=     1  avg    60.0us  before copy" in out
    # fusions ran back-to-back: no gap line should attribute idle to them
    assert "before fusion" not in out


def test_hlo_join_parser():
    """tools/trace_residue's HLO joiner: instruction names, HBM byte
    estimates (scoped-memory S(1)/S(2) buffers never touch HBM and count
    zero), operand resolution, and op_name-metadata classification — the
    machinery behind docs/sampler_residue_r4.json's per-family table."""
    from trace_residue import classify, fusion_bytes, parse_hlo, shape_bytes

    # layout annotations carry parens (tiling) and scoped-memory markers
    assert shape_bytes("bf16[54,1024,256]{2,1,0:T(8,128)(2,1)}") == \
        54 * 1024 * 256 * 2
    assert shape_bytes("bf16[54,1024,256]{2,1,0:T(8,128)(2,1)S(1)}") == 0
    assert shape_bytes("(f32[8]{0}, s32[2,2]{1,0:T(2,2)S(2)})") == 32

    hlo = """
HloModule jit_f, entry_computation_layout={()->f32[]}

%body (p: f32[2,2]) -> f32[2,2] {
  %p.1 = f32[4,4]{1,0:T(8,128)} parameter(0)
  %attn_0.9 = bf16[2,8,16]{2,1,0:T(8,128)(2,1)} custom-call(%p.1), custom_call_target="tpu_custom_call", metadata={op_name="jit(f)/while/body/UNet/down_block_0/attn_0/pallas_call" source_file="/repo/ops/pallas/attention.py" source_line=205}
  %fusion.7 = f32[4,4]{1,0:T(8,128)S(1)} fusion(%attn_0.9, %p.1), kind=kOutput, calls=%fc.1, metadata={op_name="jit(f)/while/body/UNet/mid/first_half_0/conv/conv/conv_general_dilated" source_file="/x/linear.py" source_line=700}
  ROOT %convolution_add_fusion.3 = bf16[2,4]{1,0:T(8,128)(2,1)} fusion(%fusion.7), kind=kOutput, calls=%fc.2, metadata={op_name="jit(f)/VAE.decode/decoder/attn_1/out_proj/dense/dot_general" source_file="/x/linear.py" source_line=287}
}
"""
    instrs = parse_hlo(hlo)
    # result bytes: S(1) fusion counts zero, HBM buffers count fully
    assert instrs["p.1"][0] == 4 * 4 * 4
    assert instrs["attn_0.9"][0] == 2 * 8 * 16 * 2
    assert instrs["fusion.7"][0] == 0
    # operand resolution: fusion.7 reads attn_0.9 (HBM) + p.1 (HBM)
    assert fusion_bytes("fusion.7", instrs) == 0 + 2 * 8 * 16 * 2 + 64
    # op_name classification
    assert classify("attn_0.9", instrs) == "attention-kernel"
    assert classify("fusion.7", instrs) == "conv"
    assert classify("convolution_add_fusion.3", instrs) == "attn-projection"
    assert classify("nonexistent.1", instrs) == "unmapped:nonexistent"
    assert classify("copy-done.5", instrs) == "copy"
    # loop-vs-once scoping key: the joiner reads "while" from op_name
    assert "while" in instrs["attn_0.9"][2]
    assert "while" not in instrs["convolution_add_fusion.3"][2]

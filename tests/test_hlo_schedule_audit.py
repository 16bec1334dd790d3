"""Async-collective (TPU-scheduled) HLO audit semantics.

The TPU pipeline splits collectives into ``*-start``/``*-done`` pairs
and prints computations in schedule order; audit_collectives must
normalize the kinds and take payload bytes from the operand (the start's
result type is an (operand, result, ...) tuple that would double-count),
and audit_schedule_overlap must measure the instructions the scheduler
placed between each start and its done.  Real TPU modules need the TPU
plugin (tools/ici_projection.py --tpu_topology runs that on the
tunnel-equipped machine; the v5e:2x4 full-recipe result is recorded in
BENCH_NOTES round 3), so these tests pin the parser on a hand-crafted
fixture in the exact textual format the TPU executables print.
"""

from alignn_tpu.parallel.hlo_audit import (
    audit_collectives,
    audit_schedule_overlap,
    parse_instructions,
)

# schedule order: start -> fusion (compute inside window) -> done;
# a second pair with an EMPTY window; an async all-reduce pair.
TPU_STYLE_HLO = """
HloModule jit_f, entry_computation_layout={(f32[1024,256]{1,0})->f32[]}

%fused_computation.1 (p0: f32[128,256]) -> f32[128,256] {
  %p0 = f32[128,256]{1,0} parameter(0)
  ROOT %mul = f32[128,256]{1,0} multiply(%p0, %p0)
}

ENTRY %main.42 (param.1: f32[1024,256]) -> f32[] {
  %param.1 = f32[1024,256]{1,0} parameter(0)
  %slice.1 = f32[128,256]{1,0} slice(%param.1), slice={[0:128], [0:256]}
  %collective-permute-start.1 = (f32[128,256]{1,0}, f32[128,256]{1,0}) collective-permute-start(%slice.1), channel_id=1, source_target_pairs={{0,1},{1,2}}, metadata={op_name="jit(f)/ring/ppermute"}
  %fusion.1 = f32[128,256]{1,0} fusion(%slice.1), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(f)/local"}
  %collective-permute-done.1 = f32[128,256]{1,0} collective-permute-done(%collective-permute-start.1)
  %collective-permute-start.2 = (f32[128,256]{1,0}, f32[128,256]{1,0}) collective-permute-start(%fusion.1), channel_id=2, source_target_pairs={{0,1}}, metadata={op_name="transpose(jvp(jit(f)))/ring/ppermute"}
  %collective-permute-done.2 = f32[128,256]{1,0} collective-permute-done(%collective-permute-start.2)
  %add.1 = f32[128,256]{1,0} add(%collective-permute-done.1, %collective-permute-done.2)
  %all-reduce-start.1 = f32[128,256]{1,0} all-reduce-start(%add.1), channel_id=3, replica_groups={{0,1}}, to_apply=%sum.1, metadata={op_name="jit(f)/psum"}
  %all-reduce-done.1 = f32[128,256]{1,0} all-reduce-done(%all-reduce-start.1)
  ROOT %reduce.1 = f32[] reduce(%all-reduce-done.1), dimensions={0,1}, to_apply=%sum.1
}
"""

PAYLOAD = 128 * 256 * 4  # f32[128,256]


def test_start_kind_normalized_and_payload_from_operand():
    a = audit_collectives(TPU_STYLE_HLO)
    kinds = sorted(c.kind for c in a.collectives)
    # -done ops skipped (no double count); -start normalized to base kind
    assert kinds == ["all-reduce", "collective-permute",
                     "collective-permute"]
    for c in a.permutes():
        # operand bytes, NOT the (operand, result) tuple = 2x
        assert c.payload_bytes == PAYLOAD


def test_async_phase_classification():
    a = audit_collectives(TPU_STYLE_HLO)
    assert len(a.permutes("forward")) == 1
    assert len(a.permutes("transpose")) == 1
    assert a.permutes("forward")[0].name == "collective-permute-start.1"


def test_schedule_windows():
    windows = audit_schedule_overlap(TPU_STYLE_HLO)
    assert len(windows) == 2
    byname = {w["start"]: w for w in windows}
    w1 = byname["collective-permute-start.1"]
    # the fusion is scheduled inside start.1's window
    assert w1["window_instrs"] == 1
    assert w1["window_compute_ops"] == 1
    assert w1["phase"] == "forward"
    assert w1["payload_bytes"] == PAYLOAD
    # start.2 -> done.2 is back-to-back: empty window, no compute
    w2 = byname["collective-permute-start.2"]
    assert w2["window_instrs"] == 0
    assert w2["window_compute_ops"] == 0
    assert w2["phase"] == "transpose"


def test_unsplit_cpu_form_still_parses():
    # CPU-style unsplit collective: same audit path as before the async
    # support (regression guard)
    txt = """
ENTRY %main (p: f32[64,8]) -> f32[64,8] {
  %p = f32[64,8]{1,0} parameter(0)
  ROOT %collective-permute.9 = f32[64,8]{1,0} collective-permute(%p), source_target_pairs={{0,1}}, metadata={op_name="jit(g)/ppermute"}
}
"""
    a = audit_collectives(txt)
    assert len(a.permutes()) == 1
    assert a.permutes()[0].payload_bytes == 64 * 8 * 4
    # no async pairs -> no schedule windows (CPU text is unscheduled)
    assert audit_schedule_overlap(txt) == []


def test_deep_chain_no_recursion_cliff():
    # _transitive_scatter must not hit Python's recursion limit on
    # train-shaped modules (chains several thousand deep)
    n = 5000
    lines = ["ENTRY %main (p: f32[8]) -> f32[8] {",
             "  %v0 = f32[8]{0} parameter(0)"]
    for i in range(1, n):
        lines.append(f"  %v{i} = f32[8]{{0}} add(%v{i-1}, %v{i-1})")
    lines.append(f"  ROOT %collective-permute.1 = f32[8]{{0}} "
                 f"collective-permute(%v{n-1}), "
                 f"source_target_pairs={{{{0,1}}}}, "
                 f'metadata={{op_name="jit(h)/ppermute"}}')
    lines.append("}")
    txt = "\n".join(lines)
    assert len(parse_instructions(txt)) == n + 1
    a = audit_collectives(txt)  # must not RecursionError
    assert len(a.permutes()) == 1

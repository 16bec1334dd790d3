"""Ring comm/compute overlap audit on the compiled SPMD HLO (VERDICT r2 #3).

SURVEY.md §5 requires the GP L-stage halo exchange to overlap with local
aggregation.  These tests pin, from the *optimized compiled module*:

1. the collective-permute count: (D-1) per L-stage ring + (D-1) for the
   cosine ring, each mirrored in the transpose pass;
2. bytes on the wire per chip = the analytic model
   (D-1) * E/D * 2F * dtype per L-stage (+ the [E/D, 3] cosine ring);
3. every FORWARD permute is data-independent of its own stage's
   segment-sum scatters — i.e. XLA's latency-hiding scheduler is free
   to run the sends concurrently with local aggregation (on TPU it
   splits them into collective-permute-start/done and hoists starts);
4. the REVERSE L-stage rings are accumulate-and-forward chains (each
   hop's payload contains the local scatter-add contribution) — pinned
   honestly: that serialization is the transpose of a gather and is
   structural, while the reverse *cosine* ring stays overlap-capable.

CPU-mesh HLO is used for the dependency/byte structure, which is
platform-independent (the same SPMD partitioner runs for TPU).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gp_hlo():
    import jax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from alignn_tpu.nn.models import ALIGNNAtomWise, ALIGNNAtomWiseConfig
    from alignn_tpu.parallel.gp_batch import make_ring_index
    from alignn_tpu.parallel.graph_parallel import (
        batch_specs,
        check_divisible,
        gp_device_outputs,
        ring_specs,
    )
    from alignn_tpu.parallel.gp_model import GPALIGNNAtomWise
    from alignn_tpu.parallel.mesh import make_mesh
    from alignn_tpu.train.optim import build_optimizer
    from alignn_tpu.train.state import create_train_state
    from tools.gp_sweep import build_batch

    d = 8
    batch = build_batch(32)
    check_divisible(batch, d)
    cfg = ALIGNNAtomWiseConfig(
        name="alignn_atomwise", alignn_layers=2, gcn_layers=1,
        hidden_features=64, embedding_features=32,
        gradwise_weight=1.0, stresswise_weight=0.1)
    model = ALIGNNAtomWise(cfg=cfg)
    tx = build_optimizer("adamw", 1e-3, 0.0)
    state = create_train_state(model, batch, tx)
    gp_model = GPALIGNNAtomWise(cfg=cfg, axis_name="graph")
    ring = make_ring_index(batch, d)
    mesh = make_mesh(d, axis_names=("graph",))

    def per_device(b, rg):
        out, forces, stress, _ = gp_device_outputs(
            gp_model, cfg, state.variables(), b, rg, d)
        return out, forces, stress

    fn = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(batch_specs(batch), ring_specs(ring)),
        out_specs=(P(), P(), P()), check_rep=False))
    text = fn.lower(batch, ring).compile().as_text()
    return {"text": text, "d": d, "e_pad": batch.src.shape[0],
            "f": cfg.hidden_features, "layers": cfg.alignn_layers}


def test_permute_counts(gp_hlo):
    from alignn_tpu.parallel.hlo_audit import audit_collectives

    a = audit_collectives(gp_hlo["text"])
    d, layers = gp_hlo["d"], gp_hlo["layers"]
    expected = (d - 1) * (layers + 1)  # L-stages + cosine ring
    assert len(a.permutes("forward")) == expected
    assert len(a.permutes("transpose")) == expected


def test_wire_bytes_match_analytic_model(gp_hlo):
    from alignn_tpu.parallel.hlo_audit import (
        audit_collectives,
        expected_ring_bytes,
    )

    a = audit_collectives(gp_hlo["text"])
    exp = expected_ring_bytes(
        gp_hlo["d"], gp_hlo["e_pad"], gp_hlo["f"],
        alignn_layers=gp_hlo["layers"])
    assert a.permute_bytes("forward") == exp["forward_total"]
    assert a.permute_bytes("transpose") == exp["forward_total"]
    assert (a.permute_bytes("forward")
            + a.permute_bytes("transpose")) == exp["total"]


def test_forward_rings_overlap_capable(gp_hlo):
    """No forward permute depends on its own stage's aggregation —
    the async sends can ride under the local segment sums."""
    from alignn_tpu.parallel.hlo_audit import audit_collectives

    a = audit_collectives(gp_hlo["text"])
    bad = [c.op_name for c in a.permutes("forward")
           if not c.stage_overlap_capable]
    assert bad == [], f"forward permutes serialized on own scatter: {bad}"


def test_reverse_ring_structure_pinned(gp_hlo):
    """Reverse L-stage rings are accumulate-and-forward (scatter-chained
    — structural, the transpose of the gather); the reverse cosine ring
    carries no scatter and stays overlap-capable."""
    from alignn_tpu.parallel.hlo_audit import audit_collectives

    a = audit_collectives(gp_hlo["text"])
    d, layers = gp_hlo["d"], gp_hlo["layers"]
    bwd = a.permutes("transpose")
    chained = [c for c in bwd if not c.stage_overlap_capable]
    capable = [c for c in bwd if c.stage_overlap_capable]
    assert len(chained) == (d - 1) * layers
    assert len(capable) == d - 1
    assert all("edge_update" in c.op_name for c in chained)


def test_shape_bytes_parser():
    from alignn_tpu.parallel.hlo_audit import shape_bytes

    assert shape_bytes("f32[784,256]{1,0}") == 784 * 256 * 4
    assert shape_bytes("bf16[8,128]") == 8 * 128 * 2
    assert shape_bytes("(f32[4], s32[2])") == 16 + 8
    assert shape_bytes("f32[]") == 4


def test_stage_overlap_component_anchoring():
    """Stage comparison anchors on path components: Conv_1 is NOT a
    stage-prefix of Conv_10 (flax index collision), while true own-stage
    and nested-own-stage scatter deps still chain."""
    from alignn_tpu.parallel.hlo_audit import CollectiveInfo

    def ci(stage, deps):
        return CollectiveInfo(
            name="cp", kind="collective-permute", payload_bytes=0,
            op_name=stage + "/ppermute",
            scatter_deps=frozenset(deps))

    base = "jit(f)/jvp(M)/ALIGNNConv_1"
    # sibling with a shared name prefix: capable
    assert ci(base, {"jit(f)/jvp(M)/ALIGNNConv_10/scatter-add"}
              ).stage_overlap_capable
    # genuinely own-stage scatter (direct and nested): chained
    assert not ci(base, {"jit(f)/jvp(M)/ALIGNNConv_1/scatter-add"}
                  ).stage_overlap_capable
    assert not ci(base, {"jit(f)/jvp(M)/ALIGNNConv_1/seg/scatter"}
                  ).stage_overlap_capable
    # transpose instance of the same module stage: chained
    assert not ci("jit(f)/transpose(jvp(M))/ALIGNNConv_1",
                  {"jit(f)/jvp(M)/ALIGNNConv_1/scatter"}
                  ).stage_overlap_capable
    # unrelated stage: capable
    assert ci(base, {"jit(f)/jvp(M)/EdgeGated_2/scatter"}
              ).stage_overlap_capable

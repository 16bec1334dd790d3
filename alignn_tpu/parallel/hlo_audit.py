"""Post-compile HLO audit for the ring-pipelined GP mode (VERDICT r2 #3).

SURVEY.md §5 mandates the L-stage halo exchange be *overlappable with
local aggregation*; whether XLA can actually do that is a property of
the compiled module's dependency structure, not of the Python source.
This module parses optimized HLO text (``jit(...).lower().compile()
.as_text()``) and answers, mechanically:

- how many ring ``collective-permute`` ops the module contains, their
  payload bytes, and which ring (forward jvp vs reverse transpose,
  per-layer) each belongs to;
- whether each permute is **overlap-capable**: a permute whose
  transitive operand closure contains no ``scatter`` (the local
  segment-sum aggregation) is schedulable concurrently with that
  aggregation — on TPU, XLA's latency-hiding scheduler splits it into
  ``collective-permute-{start,done}`` and hoists the start before the
  local compute.  A permute *data-dependent* on the local scatter is
  structurally serialized no matter the scheduler.
- total all-reduce (psum) bytes for the node-stage halo.

The forward ring sends ``buf`` (gate/update projections), which depends
only on dense layers of the layer input — never on the same layer's
aggregation — so every forward permute must audit overlap-capable.  The
reverse ring is the transpose of a gather out of the circulating buffer:
its payload accumulates each chip's scatter-add contribution before
being forwarded, an inherently serialized accumulate-and-forward chain
(the standard reverse-ring pattern); the audit reports it honestly
rather than pretending otherwise.  What *can* overlap in reverse is the
computation of each step's local contribution, which depends only on
forward residuals.

Used by tests/test_ring_overlap.py (asserts the byte formula
``(D-1) * E/D * 2F * dtype`` per layer and forward overlap-capability)
and tools/gp_sweep.py's ICI projection model.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%(?P<name>[^\s=]+)\s*=\s*"
                       r"(?P<rest>.+)$")
_OP_RE = re.compile(r"^(?P<type>.*?)\s(?P<op>[a-z][a-z0-9\-]*)\(")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%(?P<name>[^\s(]+)\s*\(.*\)\s*->"
                      r".*\{\s*$")
_REF_RE = re.compile(r"%([\w.\-]+)")
_CALLS_RE = re.compile(r"calls=%([\w.\-]+)")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


@dataclass
class Instr:
    name: str
    opcode: str
    type_str: str
    deps: List[str]
    calls: List[str]
    comp: str
    op_name: str = ""


@dataclass
class CollectiveInfo:
    name: str
    kind: str            # "collective-permute" | "all-reduce" | ...
    payload_bytes: int
    op_name: str
    # op_names of every scatter in the transitive operand closure
    scatter_deps: frozenset = frozenset()
    phase: str = "other"  # "forward" | "transpose" | "other"

    @property
    def scatter_free(self) -> bool:
        return not self.scatter_deps

    @property
    def stage(self) -> str:
        """The op_name prefix of the stage this collective belongs to."""
        return self.op_name.rsplit("/", 1)[0]

    @property
    def stage_overlap_capable(self) -> bool:
        """No data dependence on the OWN stage's aggregation scatters.

        Cross-layer scatter deps are inherent (layer i+1 consumes layer
        i's aggregated output); what decides whether the ring pipeline
        of one L-stage can overlap comm with its local segment sums is
        within-stage independence only."""
        # compare module-relative stages: strip the jvp/transpose
        # prefix and anchor on a path-component boundary (a bare
        # substring test would call Conv_1 a dep-stage of Conv_10)
        own = _strip_ad_prefix(self.stage)
        if not own:
            return not self.scatter_deps
        return not any(
            (dep := _strip_ad_prefix(s)) == own
            or dep.startswith(own + "/")
            or (own + "/") in dep
            for s in self.scatter_deps)


def _strip_ad_prefix(op_name: str) -> str:
    """Drop the jit/shard_map/jvp|transpose wrappers from an op_name so
    forward and transpose instances of one module stage compare equal."""
    m = re.search(r"(?:jvp|transpose)\(.*?\)[/)]*(/.*)$", op_name)
    return m.group(1) if m else op_name


@dataclass
class RingAudit:
    collectives: List[CollectiveInfo] = field(default_factory=list)

    def permutes(self, phase: Optional[str] = None):
        out = [c for c in self.collectives
               if c.kind == "collective-permute"]
        if phase is not None:
            out = [c for c in out if c.phase == phase]
        return out

    def all_reduces(self):
        return [c for c in self.collectives if c.kind == "all-reduce"]

    def permute_bytes(self, phase: Optional[str] = None) -> int:
        return sum(c.payload_bytes for c in self.permutes(phase))

    def summary(self) -> Dict:
        fwd = self.permutes("forward")
        bwd = self.permutes("transpose")
        return {
            "permutes_forward": len(fwd),
            "permutes_transpose": len(bwd),
            "permute_bytes_forward": sum(c.payload_bytes for c in fwd),
            "permute_bytes_transpose": sum(c.payload_bytes for c in bwd),
            # None (= "no evidence"), never a vacuous True, when the
            # module contains no forward permutes at all — e.g. a parse
            # miss would otherwise silently PASS the overlap claim
            "forward_overlap_capable": (
                all(c.stage_overlap_capable for c in fwd)
                if fwd else None),
            "transpose_scatter_chained": [not c.stage_overlap_capable
                                          for c in bwd].count(True),
            "all_reduce_bytes": sum(c.payload_bytes
                                    for c in self.all_reduces()),
            "all_reduces": len(self.all_reduces()),
        }


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (sums tuple elements)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_instructions(hlo_text: str) -> Dict[str, Instr]:
    """name -> Instr for every instruction in every computation."""
    instrs: Dict[str, Instr] = {}
    comp = ""
    for line in hlo_text.splitlines():
        mc = _COMP_RE.match(line)
        if mc and "=" not in line.split("(")[0]:
            comp = mc.group("name")
            continue
        mi = _INSTR_RE.match(line)
        if not mi:
            continue
        name, rest = mi.group("name"), mi.group("rest")
        mo = _OP_RE.match(rest)
        if not mo:
            continue
        opcode, type_str = mo.group("op"), mo.group("type")
        calls = _CALLS_RE.findall(rest)
        # strip metadata braces before collecting %refs (op_name text
        # can't contain %, but keep it tidy) and drop self-reference
        refs = [r for r in _REF_RE.findall(rest) if r != name]
        opname = _OPNAME_RE.search(rest)
        instrs[name] = Instr(name=name, opcode=opcode, type_str=type_str,
                             deps=refs, calls=calls, comp=comp,
                             op_name=opname.group(1) if opname else "")
    return instrs


def _scatterish(instrs: Dict[str, Instr]) -> Dict[str, bool]:
    """Instruction-level 'is a scatter' marks, seen through fusions.

    A fusion/call whose called computation contains a scatter counts as
    scatter itself (XLA wraps scatters in kLoop fusions on CPU)."""
    comp_has_scatter: Dict[str, bool] = {}
    for ins in instrs.values():
        if ins.opcode == "scatter":
            comp_has_scatter[ins.comp] = True
    marks: Dict[str, bool] = {}
    for name, ins in instrs.items():
        marks[name] = (ins.opcode == "scatter"
                       or any(comp_has_scatter.get(c, False)
                              for c in ins.calls))
    return marks


def _transitive_scatter(instrs: Dict[str, Instr]
                        ) -> Dict[str, frozenset]:
    """name -> op_names of every scatter in the transitive closure.

    Iterative post-order (explicit stack): the train-shaped 4+4-layer
    grad-of-grad modules have dependency chains several thousand
    instructions deep — Python's ~1000-frame recursion limit is a cliff
    a recursive walk would hit."""
    marks = _scatterish(instrs)
    memo: Dict[str, frozenset] = {}
    visiting = set()
    for root in instrs:
        if root in memo:
            continue
        stack = [(root, False)]
        while stack:
            name, expanded = stack.pop()
            if name in memo:
                continue
            ins = instrs.get(name)
            if ins is None:
                memo[name] = frozenset()
                continue
            if not expanded:
                visiting.add(name)
                stack.append((name, True))
                # cycle guard (HLO is a DAG, be safe): a dep already on
                # the in-progress path contributes nothing extra
                stack.extend((d, False) for d in ins.deps
                             if d not in memo and d not in visiting)
            else:
                visiting.discard(name)
                out = set()
                if marks.get(name, False):
                    out.add(ins.op_name or name)
                for d in ins.deps:
                    out |= memo.get(d, frozenset())
                memo[name] = frozenset(out)
    return memo


_COLLECTIVE_OPCODES = ("collective-permute", "all-reduce", "all-gather",
                       "reduce-scatter")


def audit_collectives(hlo_text: str) -> RingAudit:
    """Parse + classify every collective in an optimized HLO module.

    Handles both the unsplit opcodes and the async ``*-start``/``*-done``
    pairs the TPU latency-hiding scheduler emits (the ``-start`` carries
    the payload; the ``-done`` is skipped to avoid double counting).
    """
    instrs = parse_instructions(hlo_text)
    scat = _transitive_scatter(instrs)
    audit = RingAudit()
    for name, ins in instrs.items():
        kind = (ins.opcode[:-len("-start")]
                if ins.opcode.endswith("-start") else ins.opcode)
        if kind not in _COLLECTIVE_OPCODES:
            continue
        if ins.opcode.endswith("-start"):
            # async form: the result type is a (operand, result, ...)
            # tuple — summing it double-counts; take the operand's bytes
            op0 = instrs.get(ins.deps[0]) if ins.deps else None
            payload = shape_bytes(op0.type_str if op0 else ins.type_str)
        else:
            payload = shape_bytes(ins.type_str)
        # jvp(...)-wrapped or plain metadata = forward; unnamed = other
        phase = _phase_of(ins.op_name)
        audit.collectives.append(CollectiveInfo(
            name=name, kind=kind,
            payload_bytes=payload,
            op_name=ins.op_name, scatter_deps=scat[name],
            phase=phase))
    return audit


def _phase_of(op_name: str) -> str:
    if "transpose(" in op_name:
        return "transpose"
    if op_name:
        return "forward"
    return "other"


# opcodes that represent real work a collective could hide under
_COMPUTE_OPCODES = ("fusion", "dot", "convolution", "custom-call",
                    "scatter", "reduce", "reduce-window", "sort")


def audit_schedule_overlap(hlo_text: str) -> List[Dict]:
    """Measure ACTUAL overlap windows in TPU post-scheduling HLO.

    A TPU executable's ``as_text()`` prints each computation in schedule
    order (the latency-hiding scheduler runs before emission), so the
    instructions between a ``collective-permute-start`` and its matching
    ``-done`` are exactly the work scheduled under the transfer.  For
    every start/done pair this returns the window size and how many
    real-compute ops (fusions/dots/...) the scheduler placed inside it —
    ``window_compute_ops > 0`` is the machine-checked form of "the ring
    permute overlaps local compute" that VERDICT r2 #3 asked for (the
    CPU-mesh audit could only show the *capability*; this shows the TPU
    scheduler exercising it).

    Only meaningful on TPU-lowered modules (CPU HLO keeps collectives
    unsplit); returns [] there.
    """
    instrs = parse_instructions(hlo_text)
    by_comp: Dict[str, List[Instr]] = {}
    for ins in instrs.values():
        by_comp.setdefault(ins.comp, []).append(ins)
    windows: List[Dict] = []
    for comp, seq in by_comp.items():
        pos = {ins.name: i for i, ins in enumerate(seq)}
        for ins in seq:
            if ins.opcode != "collective-permute-done":
                continue
            starts = [d for d in ins.deps
                      if d in instrs
                      and instrs[d].opcode == "collective-permute-start"]
            if not starts:
                continue
            start = instrs[starts[0]]
            between = seq[pos[start.name] + 1:pos[ins.name]]
            op0 = instrs.get(start.deps[0]) if start.deps else None
            windows.append({
                "start": start.name,
                "phase": _phase_of(start.op_name),
                "payload_bytes": shape_bytes(
                    op0.type_str if op0 else start.type_str),
                "window_instrs": len(between),
                "window_compute_ops": sum(
                    1 for b in between if b.opcode in _COMPUTE_OPCODES),
                "op_name": start.op_name,
            })
    return windows


def expected_ring_bytes(n_devices: int, e_pad: int, features: int,
                        dtype_bytes: int = 4, r_dtype_bytes: int = 4,
                        alignn_layers: int = 1,
                        with_gradient: bool = True) -> Dict[str, int]:
    """The analytic wire-byte model the audit is checked against.

    Per chip, per direction of the ring:
    - each L-stage: (D-1) permutes of the [E/D, 2F] gate/update buffer;
    - the cosine ring (once): (D-1) permutes of the [E/D, 3] r shard;
    - the reverse rings mirror the forward ones exactly (the transpose
      of ppermute is ppermute with inverted pairs).
    """
    d = n_devices
    shard = e_pad // d
    l_stage = (d - 1) * shard * 2 * features * dtype_bytes
    cosines = (d - 1) * shard * 3 * r_dtype_bytes
    fwd = alignn_layers * l_stage + cosines
    return {
        "per_l_stage": l_stage,
        "cosine_ring": cosines,
        "forward_total": fwd,
        "total": fwd * (2 if with_gradient else 1),
    }


def expected_halo_bytes(node_steps, edge_steps, features: int,
                        dtype_bytes: int = 4, r_dtype_bytes: int = 4,
                        alignn_layers: int = 1, gcn_layers: int = 0,
                        with_gradient: bool = True):
    """Analytic wire-byte model for the halo dense-GP mode
    (parallel/dense_gp.py), the dense counterpart of
    :func:`expected_ring_bytes`.

    Per chip, per direction: every node-stage EGGC exchanges the
    [sum(node_steps), 2F] concatenated gate/update halo once; every
    L-stage exchanges the [sum(edge_steps), F] edge halo TWICE
    (dst_gate out, h_jt back); the force assembly exchanges the
    [sum(edge_steps), 3] pair-force halo once.  Transposes mirror the
    forward exactly (ppermute transposes to ppermute; the halo hops are
    independent, no accumulate-and-forward chain).
    """
    node_rows = int(sum(node_steps))
    edge_rows = int(sum(edge_steps))
    node_x = node_rows * 2 * features * dtype_bytes
    l_stage = 2 * edge_rows * features * dtype_bytes
    fwd = alignn_layers * (node_x + l_stage) + gcn_layers * node_x
    forces = edge_rows * 3 * r_dtype_bytes if with_gradient else 0
    # the FIRST node-stage's cat table is a function of atom features
    # only (x = atom_embedding before any r-dependent mixing), so dE/dr
    # carries no cotangent for it: one node exchange has no transpose
    first_stage = node_x if (alignn_layers or gcn_layers) else 0
    transpose = fwd - first_stage
    return {
        "node_exchange": node_x,
        "per_l_stage": l_stage,
        "forces_exchange": forces,
        # phases of the audited FF-forward module (energy fwd + its
        # transpose from value_and_grad + the force halo, which runs
        # outside the grad and therefore lands in the forward phase)
        "forward_total": fwd + forces,
        "transpose_total": transpose,
        "total": fwd + forces + transpose,
    }

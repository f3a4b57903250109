"""HLO traffic attribution parser (scripts/hlo_traffic.py).

The measured-accounting script walks an optimized HLO dump and charges
every top-level instruction its operand + result bytes, bucketed by the
ops its fusion body contains. These tests pin the parser on a
hand-written module covering the constructs that matter: fusion bodies
(free), while bodies (live), reducer computations (free), tuples/GTEs
(skipped), and the category heuristics.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from hlo_traffic import attribute, parse_module, shape_bytes

MODULE = """\
HloModule test, entry_computation_layout={()->f32[8,16]{1,0}}

%fused_computation.1 (param_0: f32[8,16]) -> f32[8,16] {
  %param_0 = f32[8,16]{1,0} parameter(0)
  %c = f32[] constant(2)
  %b = f32[8,16]{1,0} broadcast(%c), dimensions={}
  ROOT %mul = f32[8,16]{1,0} multiply(%param_0, %b)
}

%fused_reduce (param_0: bf16[8,16]) -> f32[8] {
  %param_0 = bf16[8,16]{1,0} parameter(0)
  %cvt = f32[8,16]{1,0} convert(%param_0)
  %zero = f32[] constant(0)
  ROOT %r = f32[8]{0} reduce(%cvt, %zero), dimensions={1}, to_apply=%add_comp
}

%add_comp (a: f32[], b: f32[]) -> f32[] {
  %a = f32[] parameter(0)
  %b = f32[] parameter(1)
  ROOT %s = f32[] add(%a, %b)
}

%body (p: (s32[], f32[8,16])) -> (s32[], f32[8,16]) {
  %p = (s32[], f32[8,16]{1,0}) parameter(0)
  %i = s32[] get-tuple-element(%p), index=0
  %x = f32[8,16]{1,0} get-tuple-element(%p), index=1
  %one = s32[] constant(1)
  %i2 = s32[] add(%i, %one)
  %fus = f32[8,16]{1,0} fusion(%x), kind=kLoop, calls=%fused_computation.1
  ROOT %t = (s32[], f32[8,16]{1,0}) tuple(%i2, %fus)
}

%cond (p: (s32[], f32[8,16])) -> pred[] {
  %p = (s32[], f32[8,16]{1,0}) parameter(0)
  %i = s32[] get-tuple-element(%p), index=0
  %n = s32[] constant(4)
  ROOT %lt = pred[] compare(%i, %n), direction=LT
}

ENTRY %main () -> f32[8,16] {
  %zero = s32[] constant(0)
  %x0 = f32[8,16]{1,0} iota(), iota_dimension=0
  %init = (s32[], f32[8,16]{1,0}) tuple(%zero, %x0)
  %w = (s32[], f32[8,16]{1,0}) while(%init), condition=%cond, body=%body
  %xw = f32[8,16]{1,0} get-tuple-element(%w), index=1
  %xb = bf16[8,16]{1,0} convert(%xw)
  %stats = f32[8]{0} fusion(%xb), kind=kInput, calls=%fused_reduce
  %sb = f32[8,16]{1,0} broadcast(%stats), dimensions={0}
  ROOT %out = f32[8,16]{1,0} add(%xw, %sb)
}
"""


def test_shape_bytes():
    assert shape_bytes("f32[8,16]{1,0}") == 8 * 16 * 4
    assert shape_bytes("bf16[4,4]") == 32
    assert shape_bytes("(s32[], f32[8,16]{1,0})") == 4 + 512
    assert shape_bytes("pred[]") == 1


def test_parse_and_attribute():
    comps, entry = parse_module(MODULE)
    assert entry == "main"
    assert set(comps) == {"fused_computation.1", "fused_reduce",
                          "add_comp", "body", "cond", "main"}

    cats, _ = attribute(MODULE)
    # fusion bodies and the reducer contribute nothing on their own
    f = 8 * 16 * 4     # one f32[8,16] buffer
    b = 8 * 16 * 2     # bf16[8,16]
    s = 8 * 4          # f32[8]
    # entry: convert(xw)=f+b, stats fusion(in b, out s) -> norm_stats,
    #        broadcast(stats)=s+f (elementwise? broadcast alone -> layout),
    #        add(xw, sb)=3f; while/tuple/gte skipped
    # body:  add scalars (8 bytes), fusion(x)->fused_computation.1 = 2f
    #        (multiply body -> elementwise_other)
    # cond:  compare = s32+s32+pred = 9 bytes
    assert cats["norm_stats"] == b + s
    assert cats["elementwise_other"] == (f + b) + 3 * f + (4 + 4 + 4) + \
        2 * f + (4 + 4 + 1)
    assert cats["layout_copy"] == s + f
    total = sum(cats.values())
    assert total == cats["norm_stats"] + cats["elementwise_other"] + \
        cats["layout_copy"]


ASYNC_MODULE = """\
HloModule async_test, entry_computation_layout={()->f32[8,16]{1,0}}

ENTRY %main () -> f32[8,16] {
  %x0 = f32[8,16]{1,0} iota(), iota_dimension=0
  %cs = (f32[8,16]{1,0}, f32[8,16]{1,0:S(1)}, u32[]) copy-start(%x0)
  %cd = f32[8,16]{1,0} copy-done(%cs)
  %cp = f32[8,16]{1,0} copy(%cd)
  ROOT %out = f32[8,16]{1,0} add(%cd, %cp)
}
"""


def test_async_msa_copies_bucketed_as_vmem_prefetch():
    """copy-start/copy-done pairs are XLA memory-space-assignment
    prefetch/eviction traffic (identical layouts, S(1) space in the tuple)
    — bucketed apart from genuine layout copies so the layout_copy number
    is the recoverable one."""
    cats, _ = attribute(ASYNC_MODULE)
    f = 8 * 16 * 4
    # copy-start charges tuple result (2f + 4) + operand f; copy-done
    # charges result f + operand tuple (2f + 4)
    assert cats["vmem_prefetch"] == (3 * f + 4) * 2
    # the plain copy stays a layout_copy (result + operand)
    assert cats["layout_copy"] == 2 * f
    assert cats["elementwise_other"] == 3 * f

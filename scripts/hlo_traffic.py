"""Measured HBM-traffic attribution from the compiled HLO (r4).

`scripts/traffic_accounting.py` attributes the bench workload's traffic
from the ARCHITECTURE (4.44 of 5.02 GB/step, 88%); this script closes the
residual by measuring: it AOT-compiles the same one-step DDIM workload
`bench.py` costs (batch 64, 128-ch UNet, bf16 streams, XLA attention),
walks the OPTIMIZED HLO module, and charges every top-level instruction
its operand + result buffer bytes — the physical-traffic model XLA's own
"bytes accessed" uses (each non-fused instruction reads its operands from
HBM and writes its result back; everything inside a fusion body is free).

Instructions are bucketed by what their fusion bodies contain:

  conv_dense        convolution / dot anywhere in the body (the floor)
  norm_stats        reduce over array operands (GroupNorm mean/var pass)
  softmax           exponential / divide after reduce (attention scores)
  concat            concatenate at top level or in the body
  layout_copy       copy / transpose / reshape-only fusions
  vmem_prefetch     async copy-start/copy-done pairs from XLA's
                    memory-space assignment (HBM<->VMEM S(1), identical
                    layouts) — an XLA prefetch/eviction OPTIMIZATION the
                    consumer's operand charge double-counts, not
                    recoverable layout waste (r5 finding: 3 pairs at
                    [64,32,32,128] + 1 at [64,16,16,256] ~ 0.3 GB/step
                    of the r4 "layout_copy" bucket were these)
  elementwise_other everything else (FiLM, SiLU tails, DDIM update, ...)

Run on the real TPU (the fusion decisions are the backend's):
  python scripts/hlo_traffic.py
CPU works for parser development but reflects CPU fusion choices.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
               "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8,
               "u64": 8, "f64": 8, "c64": 8, "c128": 16}

_ARRAY_RE = re.compile(r"(pred|[sufc]\d+|bf16|f16|f32|f64)\[([\d,]*)\]")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?.*?\)?)\s+"
                       r"([\w\-]+)\((.*)$")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+(?:\([^)]*\)\s*->|\{)")


def shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string (array or tuple of arrays)."""
    total = 0
    for dt, dims in _ARRAY_RE.findall(shape_str):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES.get(dt, 4)
    return total


def parse_module(text: str):
    """Split an HLO module dump into computations.

    Returns (comps, entry_name) where comps maps computation name ->
    list of (instr_name, shape_str, opcode, rest_of_line).
    """
    comps, entry = {}, None
    cur = None
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("//"):
            continue
        if stripped.startswith("HloModule"):
            continue
        # computation header: "%name (params) -> shape {" or "ENTRY %name ..."
        if stripped.endswith("{") and "=" not in stripped.split("(")[0]:
            m = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)", stripped)
            if m:
                cur = m.group(2)
                comps[cur] = []
                if m.group(1):
                    entry = cur
            continue
        if stripped.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(line)
        if m:
            name, shape, opcode, rest = m.groups()
            comps[cur].append((name, shape, opcode, rest))
    return comps, entry


# opcodes whose result is an alias / control construct, not a new buffer
SKIP_OPS = {"parameter", "constant", "get-tuple-element", "tuple",
            "bitcast", "while", "conditional", "call", "after-all",
            "partition-id", "replica-id", "iota"}

CATEGORY_PRIORITY = ["conv_dense", "softmax", "norm_stats", "concat",
                     "layout_copy", "vmem_prefetch"]


def body_ops(comps, called):
    ops = set()
    for (_, _, opcode, _) in comps.get(called, ()):
        ops.add(opcode)
    return ops


def categorize(opcode: str, rest: str, comps) -> str:
    if opcode in ("copy-start", "copy-done", "async-start", "async-done",
                  "async-update"):
        # single-chip programs only get async ops from memory-space
        # assignment: whole-buffer HBM<->VMEM copies (copy-start, S(1)
        # space, identical layouts) and sliced prefetches of large
        # weight/skip buffers (slice-start/done). Physically these read
        # each buffer once — a read the consumer is charged for anyway —
        # so bucket them apart from recoverable layout copies.
        return "vmem_prefetch"
    if opcode == "custom-call" and "ConcatBitcast" in rest:
        # MSA stitches sliced prefetches back together with a bitcast:
        # zero data movement, charged here only for visibility
        return "vmem_prefetch"
    ops = {opcode}
    m = re.search(r"calls=%?([\w.\-]+)", rest)
    if m:
        ops |= body_ops(comps, m.group(1))
    if "convolution" in ops or "dot" in ops:
        return "conv_dense"
    if "exponential" in ops:
        return "softmax"
    if "reduce" in ops or "reduce-window" in ops:
        return "norm_stats"
    if "concatenate" in ops:
        return "concat"
    if ops <= {"fusion", "copy", "transpose", "reshape", "broadcast",
               "slice", "pad", "reverse", "copy-start", "copy-done"}:
        return "layout_copy"
    return "elementwise_other"


def attribute(text: str):
    comps, entry = parse_module(text)
    # computations whose instructions are free (fusion bodies, reducers)
    fused = set()
    for instrs in comps.values():
        for (_, _, opcode, rest) in instrs:
            for kw in ("calls", "to_apply"):
                m = re.search(kw + r"=%?([\w.\-]+)", rest)
                if m:
                    fused.add(m.group(1))
    # computations that execute as real programs: entry + while bodies/
    # conditions + conditional branches
    live = {entry} if entry else set()
    for instrs in comps.values():
        for (_, _, opcode, rest) in instrs:
            if opcode in ("while", "conditional"):
                for m in re.finditer(
                        r"(?:body|condition|branch_computations=\{[^}]*|"
                        r"true_computation|false_computation)=?%?([\w.\-]+)",
                        rest):
                    live.add(m.group(1))
                for m in re.finditer(r"%([\w.\-]+)", rest):
                    if m.group(1) in comps and m.group(1) not in fused:
                        live.add(m.group(1))
    live -= fused

    # instruction result sizes, for operand lookup (per computation scope)
    cats = {}
    detail = []
    for cname in sorted(live & set(comps)):
        sizes = {n: shape_bytes(s) for (n, s, _, _) in comps[cname]}
        for (name, shape, opcode, rest) in comps[cname]:
            if opcode in SKIP_OPS:
                continue
            out_b = shape_bytes(shape)
            # operands: %refs before the first "," that starts metadata —
            # conservatively take all %refs that name instructions in scope
            opnd_b = sum(sizes.get(r, 0)
                         for r in re.findall(r"%([\w.\-]+)", rest)
                         if r in sizes)
            cat = categorize(opcode, rest, comps)
            cats[cat] = cats.get(cat, 0) + out_b + opnd_b
            if out_b + opnd_b > 2 << 20:
                m = re.search(r'op_name="([^"]*)"', rest)
                op = m.group(1) if m else ""
                if not op and opcode == "fusion":
                    # fusion lines carry no metadata; use the body root's
                    mc = re.search(r"calls=%?([\w.\-]+)", rest)
                    if mc and mc.group(1) in comps:
                        body = comps[mc.group(1)]
                        for (_, _, _, brest) in reversed(body):
                            mb_ = re.search(r'op_name="([^"]*)"', brest)
                            if mb_:
                                op = mb_.group(1)
                                break
                detail.append((cat, opcode, round((out_b + opnd_b) / 1e6, 1),
                               shape.split("{")[0], name, op))
    return cats, detail


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dump", default=None,
                   help="attribute an existing HLO text dump instead of "
                        "compiling (offline/parser testing)")
    p.add_argument("--out", default=None, help="write JSON here too")
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--save_hlo", default=None,
                   help="gzip the optimized HLO text here — one chip "
                        "compile buys unlimited offline --dump analysis")
    p.add_argument("--detail_category", default=None,
                   help="restrict top_instructions_mb to one category "
                        "(e.g. layout_copy) and include instruction names")
    args = p.parse_args(argv)

    if args.dump:
        if args.dump.endswith(".gz"):
            import gzip
            with gzip.open(args.dump, "rt") as f:
                text = f.read()
        else:
            text = open(args.dump).read()
        cost_bytes = None
        backend = "dump"
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_tpu_diffusion"))
        import jax.numpy as jnp

        from tpu_diffusion.core.schedules import DDPM
        from tpu_diffusion.models.unet import create_model
        from tpu_diffusion.sampling.ancestral import make_ddim_sampler

        model = create_model(
            image_size=32, num_channels=128, num_res_blocks=2,
            in_channels=3, channel_mult=(1, 2, 2, 2), num_heads=4,
            attention_resolutions="16", dropout=0.0,
            use_scale_shift_norm=True, dtype=jnp.bfloat16,
            norm_dtype=jnp.bfloat16,
            attention_impl=os.environ.get("TPU_DIFFUSION_BENCH_ATTN",
                                          "xla"))
        x = jnp.zeros((args.batch, 32, 32, 3), jnp.float32)
        t = jnp.zeros((args.batch,))
        params = model.init(jax.random.PRNGKey(0), x, t)
        params = jax.tree.map(
            lambda q: q.astype(jnp.bfloat16)
            if q.dtype == jnp.float32 else q, params)
        ddpm = DDPM.create(1000)

        def eps_fn(xi, i):
            return model.apply(params, xi, i.astype(jnp.float32) / 1000.0)

        key = jax.random.PRNGKey(1)
        xT = jax.random.normal(key, (args.batch, 32, 32, 3))
        one_step = jax.jit(make_ddim_sampler(eps_fn, ddpm, num_steps=1))
        compiled = one_step.lower(key, xT).compile()
        text = compiled.as_text()
        try:
            cost_bytes = float(
                compiled.cost_analysis().get("bytes accessed", 0.0))
        except Exception:
            cost_bytes = None
        backend = str(jax.devices()[0])

    if args.save_hlo:
        import gzip
        with gzip.open(args.save_hlo, "wt") as f:
            f.write(text)
        print(f"[hlo_traffic] optimized HLO saved to {args.save_hlo}",
              file=sys.stderr)

    cats, detail = attribute(text)
    if args.detail_category:
        detail = [d for d in detail if d[0] == args.detail_category]
    total = sum(cats.values())
    out = {
        "backend": backend,
        "batch": args.batch,
        "per_step_gb_measured": {k: round(v / 1e9, 4)
                                 for k, v in sorted(cats.items())},
        "total_gb_measured": round(total / 1e9, 4),
        "cost_analysis_bytes_gb": (round(cost_bytes / 1e9, 4)
                                   if cost_bytes else None),
        "note": ("per top-level HLO instruction: operand + result buffer "
                 "bytes; fusion bodies free — the physical-traffic model "
                 "behind XLA's 'bytes accessed'"),
        "top_instructions_mb": [
            {"category": c, "opcode": o, "mb": mb, "shape": s, "name": n,
             "op_name": op}
            for (c, o, mb, s, n, op) in
            sorted(detail, key=lambda r: -r[2])[:args.top]],
    }
    js = json.dumps(out, indent=2)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()

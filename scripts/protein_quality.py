"""Train the protein backbone diffusion model on the chip and track
sample-quality-vs-step — the protein-stack analogue of the FID curve.

The reference's protein evaluation protocol (`amortised diffusion/
src/evaluation/evaluation_pipeline.py` + plot_pipeline.py) compares the
distributions of per-sample backbone statistics (consecutive C-alpha
distances, pseudo-bond angles, SSE fractions, radius of gyration) between
generated samples and the training set. This script runs that protocol at
training snapshots, reducing each overlay to the pipeline's scalar
1-Wasserstein distance (`compare_to_training`), so the curve shows the
generative model's statistics converging toward the data's:

  1. train the reference GVP recipe (HoogeboomGraphSDE N=250, GVP denoiser,
     DSM + 0.25*(backbone+distogram) aux — configs/diffusion/default.yaml,
     configs/model/gvp_denoiser.yaml, src/models/resdiff.py:111-157) on the
     registry's protein data (synthetic helix-bundle fallback here — the
     curve is self-consistent: same evaluator, same training statistics
     for every snapshot);
  2. at each snapshot, sample `--num_samples` backbones unconditionally
     (blob prior -> 250-step reverse chain, one jitted lax.scan) and run
     the full EvaluationPipeline on them;
  3. report per-snapshot headline statistics and W1 distances vs the
     cached training-set statistics.

Writes results_protein_quality/quality_curve.json and a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_tpu_diffusion"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from tpu_diffusion.cli.train_protein import build_model
from tpu_diffusion.parallel.mesh import make_mesh
from tpu_diffusion.protein.data import (COORD_SCALE, get_protein_data,
                                        protein_batches)
from tpu_diffusion.protein.evaluate import (EvaluationPipeline,
                                            compare_to_training, summarize)
from tpu_diffusion.protein.resdiff import resdiff_loss
from tpu_diffusion.protein.sde import HoogeboomGraphSDE, ProteinBatch
from tpu_diffusion.train.actions import PeriodicCallback
from tpu_diffusion.train.trainer import (TrainState, Trainer, make_optimizer,
                                         make_train_step)

HEADLINE = ["ca_distance_mean", "ca_distance_valid_frac", "ca_angle_mean",
            "helix_proportion", "radius_of_gyration"]
W1_KEYS = ["ca_distance_mean", "ca_angle_mean", "radius_of_gyration",
           "helix_proportion"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot_steps", default="0,250,500,1000,2000,3000")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_len", type=int, default=112)
    p.add_argument("--node_scalars", type=int, default=256)
    p.add_argument("--node_vectors", type=int, default=64)
    p.add_argument("--conv_layers", type=int, default=5)
    p.add_argument("--diffusion_steps", type=int, default=250)
    p.add_argument("--aux_weight", type=float, default=0.25)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--sample_batch", type=int, default=32)
    p.add_argument("--pipeline", default="device",
                   choices=["device", "host"],
                   help="device = HBM-staged dataset + chunked lax.scan "
                   "(TPU-native, round 4); host = per-step host batches "
                   "(the r3 runs' path)")
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--num_train_eval", type=int, default=256,
                   help="training chains used for the reference statistics")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize GVP conv layers (fits bs 32 on v5e)")
    p.add_argument("--data_root", default="data/scope")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="results_protein_quality")
    args = p.parse_args(argv)

    snap_steps = sorted({int(s) for s in args.snapshot_steps.split(",")})
    total_steps = max(snap_steps)
    os.makedirs(args.out, exist_ok=True)

    mesh = make_mesh()
    ds = get_protein_data(args.data_root, max_len=args.max_len,
                          seed=args.seed)
    print(f"[protein_quality] {len(ds)} proteins "
          f"(synthetic={ds.synthetic}), max_len {ds.max_len}", flush=True)

    diffuser = HoogeboomGraphSDE(num_steps=args.diffusion_steps)
    model = build_model(args)

    def loss_fn(params, key, batch):
        pb = ProteinBatch.from_positions(batch["pos"], batch["mask"])
        apply = lambda b, t: model.apply(params, b, t)
        total, _ = resdiff_loss(key, apply, diffuser, pb,
                                aux_weight=args.aux_weight)
        return total

    rng = jax.random.PRNGKey(args.seed)
    init_batch = ProteinBatch.from_positions(
        jnp.zeros((1, args.max_len, 3)), jnp.ones((1, args.max_len), bool))
    params = jax.jit(model.init)(rng, init_batch, jnp.zeros((1,)))
    n_params = sum(q.size for q in jax.tree.leaves(params))
    print(f"[protein_quality] {n_params/1e6:.2f}M params", flush=True)

    tx = make_optimizer(args.lr, warmup=0, grad_clip=1.0,
                        schedule="constant")
    state = TrainState.create(params, tx, rng)
    train_step = make_train_step(loss_fn, tx, ema_decay=0.999)

    # Restart-from-latest (r4): the axon tunnel drops for hours mid-run;
    # keep the FULL TrainState (params+ema+opt_state+step+rng) in a side
    # checkpoint so a stall costs only the in-flight segment. The device
    # pipeline's batch stream is a pure function of (seed, step), so the
    # resumed run sees exactly the batches the lost one would have
    # (pinned in tests/test_train.py).
    from tpu_diffusion.train.checkpoint import CheckpointManager
    resume = CheckpointManager(os.path.join(args.out, "resume"), maximum=1)
    assets, _ = resume.load({"state": state})
    state = assets["state"]

    last_loss = {"v": None}

    def log_cb(step, metrics, **kw):
        last_loss["v"] = float(metrics["loss"])
        print(f"[protein_quality] step {step} loss={metrics['loss']:.4f} "
              f"({metrics['steps_per_sec']:.2f} steps/s)", flush=True)

    if args.pipeline == "device":
        # TPU-native path (round 4): positions+lengths staged in HBM,
        # minibatches drawn inside a chunked lax.scan — no per-step
        # host->device traffic (PERF.md "Device-resident data pipeline")
        from tpu_diffusion.data.device_cache import make_protein_sampler
        sampler = make_protein_sampler(ds.positions, ds.lengths,
                                       args.batch_size, mesh=mesh)
        trainer = Trainer(train_step, state, iter(()), mesh=mesh)
        fit_segment = lambda n: trainer.fit_scanned(
            n, sampler, chunk=args.chunk,
            base_key=jax.random.PRNGKey(args.seed + 101),
            metrics_hook=log_cb)
    else:
        callbacks = [PeriodicCallback(callback_fn=log_cb, every_steps=200)]
        batches = protein_batches(ds, args.batch_size, seed=args.seed)
        trainer = Trainer(train_step, state, batches, mesh=mesh,
                          callbacks=callbacks)
        fit_segment = trainer.fit

    # ---- training-set reference statistics --------------------------------
    pipeline = EvaluationPipeline()
    rng_np = np.random.default_rng(args.seed + 3)
    idx = rng_np.choice(len(ds), min(args.num_train_eval, len(ds)),
                        replace=False)
    train_structs = {
        f"train_{i}": ds.positions[i][:ds.lengths[i]] / COORD_SCALE
        for i in idx}
    train_rows = pipeline.eval_training_set(
        train_structs, os.path.join(args.out, "train_stats.csv"))
    train_summary = summarize(train_rows)
    print(f"[protein_quality] train stats over {len(train_rows)} chains: "
          + " ".join(f"{k}={train_summary[k + '_mean']:.3f}"
                     for k in HEADLINE), flush=True)

    # ---- sampling + evaluation per snapshot -------------------------------
    @jax.jit
    def gen_batch(params, key, lengths):
        k1, k2 = jax.random.split(key)
        blob = diffuser.sample_blob(k1, args.sample_batch, args.max_len,
                                    lengths=lengths)
        out = diffuser.reverse_diffusion_sampling(
            k2, blob, lambda b, t: model.apply(params, b, t))
        return out.pos, out.mask

    def eval_of(params, csv_name=None):
        params = jax.tree.map(jnp.asarray, params)
        key = jax.random.PRNGKey(args.seed + 11)
        rng_l = np.random.default_rng(args.seed + 11)
        structs = {}
        while len(structs) < args.num_samples:
            key, k = jax.random.split(key)
            lengths = jnp.asarray(rng_l.choice(ds.lengths,
                                               args.sample_batch))
            pos, mask = gen_batch(params, k, lengths)
            pos, mask = np.asarray(pos), np.asarray(mask)
            for i in range(args.sample_batch):
                if len(structs) >= args.num_samples:
                    break
                structs[f"sample_{len(structs):04d}"] = \
                    pos[i][mask[i]] / COORD_SCALE
        rows = pipeline.eval_many(structs)
        if csv_name:  # per-sample stats consumable by eval/plotting's CLI
            from tpu_diffusion.protein.evaluate import _write_csv
            _write_csv(rows, os.path.join(args.out, csv_name))
        return rows

    # ---- segmented train -> eval -> persist per snapshot ------------------
    # The axon tunnel can drop mid-run on long jobs (observed twice); each
    # completed snapshot's checkpoint, per-sample CSV, and curve entry hit
    # disk before the next training segment starts, so a stall costs only
    # the in-flight segment.
    ckpt = CheckpointManager(os.path.join(args.out, "ckpt"), maximum=2)
    table = []
    result = {
        "recipe": "HoogeboomGraphSDE N=%d, GVP (%d,%d)x%d, DSM + %g*aux, "
                  "Adam %g, bs %d" % (args.diffusion_steps,
                                      args.node_scalars, args.node_vectors,
                                      args.conv_layers, args.aux_weight,
                                      args.lr, args.batch_size),
        "dataset": args.data_root + (" (synthetic fallback)"
                                     if ds.synthetic else ""),
        "num_samples": args.num_samples,
        "num_train_eval": len(train_rows),
        "pipeline": args.pipeline,
        "params_m": round(n_params / 1e6, 2),
        "train_reference": {k: round(train_summary[k + "_mean"], 4)
                            for k in HEADLINE},
        "curve": table,
        "partial": True,
    }
    path = os.path.join(args.out, "quality_curve.json")

    def write_json():
        with open(path, "w") as f:
            json.dump(result, f, indent=2)

    prev = int(state.step)
    start_step = prev
    if prev and os.path.exists(path):
        # Re-populate curve rows persisted by the run this one resumes.
        try:
            with open(path) as f:
                table.extend(r for r in json.load(f).get("curve", [])
                             if r["step"] <= prev)
        except Exception:
            pass
    done_steps = {r["step"] for r in table}

    t0 = time.monotonic()
    params_s = jax.tree.map(np.asarray, state.params)
    for step_target in snap_steps:
        if step_target < prev or (step_target == prev
                                  and step_target in done_steps):
            continue
        if step_target > prev:
            state = fit_segment(step_target - prev)
            prev = step_target
        params_s = jax.tree.map(np.asarray, state.params)
        ckpt.save(step_target, {
            "params": params_s,
            "ema": jax.tree.map(np.asarray, state.ema.params),
            "step": step_target})
        t1 = time.monotonic()
        rows = eval_of(params_s,
                       csv_name=f"sample_stats_{step_target}.csv")
        s = summarize(rows)
        w1 = compare_to_training(rows, train_rows)
        entry = {"step": step_target, "loss": last_loss["v"]}
        for k in HEADLINE:
            entry[k] = round(s.get(f"{k}_mean", float("nan")), 4)
        for k in W1_KEYS:
            entry[f"w1_{k}"] = round(w1.get(f"{k}_w1_vs_train",
                                            float("nan")), 4)
        table.append(entry)
        write_json()
        resume.save(step_target,
                    {"state": jax.tree.map(np.asarray, state)})
        print(f"[protein_quality] step {step_target}: "
              + " ".join(f"{k}={entry[k]}" for k in HEADLINE)
              + " | W1 " + " ".join(f"{k}={entry['w1_' + k]}"
                                    for k in W1_KEYS)
              + f" ({time.monotonic()-t1:.1f}s)", flush=True)

    total_trained = prev - start_step
    train_secs = time.monotonic() - t0
    result["train_steps_per_sec_incl_eval"] = round(
        total_trained / max(train_secs, 1e-9), 3)
    ema_params = jax.tree.map(np.asarray, state.ema.params)

    # final artifacts: a few PDB samples from the final model (the orbax
    # checkpoint per snapshot is already on disk)
    final_params = jax.tree.map(jnp.asarray, params_s)
    key = jax.random.PRNGKey(args.seed + 23)
    lengths = jnp.asarray(np.random.default_rng(args.seed + 23)
                          .choice(ds.lengths, args.sample_batch))
    pos, mask = map(np.asarray, gen_batch(final_params, key, lengths))
    from tpu_diffusion.protein.pdb import write_ca_pdb
    for i in range(min(4, args.sample_batch)):
        coords = pos[i][mask[i]] / COORD_SCALE
        np.save(os.path.join(args.out, f"sample_{i:02d}.npy"), coords)
        write_ca_pdb(coords, os.path.join(args.out, f"sample_{i:02d}.pdb"))

    ema_rows = eval_of(ema_params, csv_name="sample_stats_ema.csv")
    ema_w1 = compare_to_training(ema_rows, train_rows)
    ema_entry = {f"w1_{k}": round(ema_w1.get(f"{k}_w1_vs_train",
                                             float("nan")), 4)
                 for k in W1_KEYS}
    print(f"[protein_quality] final EMA params: {ema_entry}", flush=True)

    result["final_ema_w1"] = ema_entry
    result["partial"] = False
    write_json()
    hdr = ["step", "loss"] + HEADLINE + [f"w1_{k}" for k in W1_KEYS]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in table:
        print("| " + " | ".join(str(r.get(k, "")) for k in hdr) + " |")
    print(f"[protein_quality] wrote {path}", flush=True)


if __name__ == "__main__":
    main()

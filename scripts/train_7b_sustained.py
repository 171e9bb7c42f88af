"""Sustained 7B QLoRA training on ONE chip: loss curve + checkpoint/resume.

Extends the single-step probe (train_7b_qlora_probe.py) to the evidence the
round-3 verdict asked for: hundreds of REAL train steps at the stage-1 MAD
geometry through the real dataset/collator/trainer, a mid-run orbax
checkpoint, auto-resume across a process restart, steady tokens/s and
step-time variance — the reference's training budget anchor is 10 days on
8xA100 (scripts/mad/stage1_dense.sh:5,42-60).

The base is a random-init 7B quantized host-side to int8 (QLoRA: frozen int8
base + bf16 LoRA r=64 + ClipEncoder adapter); data is the synthetic grounding
corpus at 768-dim MAD geometry, so the loss curve reflects REAL learning
(answer template + localization), not a frozen constant batch.

Run (TPU, ambient env):
  python scripts/train_7b_sustained.py --out /tmp/sustained --max_steps 200
  python scripts/train_7b_sustained.py --out /tmp/sustained --max_steps 350
The second invocation must print 'resumed from ... at step 200'.
Writes <out>/train_log.jsonl + <out>/TRAIN_7B.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _host_random_base(cfg, rng: np.random.Generator):
    """Structure-correct pseudo-random 7B built DIRECTLY in the int8 serving
    form. A true per-value RNG init is ~27 GB of gaussians — this host's
    single throttled core generates ~2-5 M values/s, i.e. >30 min of pure
    RNG. Instead one 4 M-entry int8 block is tiled into every matrix with a
    per-layer roll (memory-speed, ~1-2 min); std ~0.02 via the scale rows.
    Throughput and training-dynamics fidelity do not need per-value entropy.
    """
    import jax

    from revisionllm_tpu.models import llama

    shapes = jax.eval_shape(
        lambda k: llama.init_params(cfg, k, np.float32), jax.random.PRNGKey(0)
    )
    block = rng.integers(-127, 128, size=4_000_003, dtype=np.int64).astype(np.int8)
    state = {"i": 0}

    def tile_i8(shape):
        n = int(np.prod(shape))
        state["i"] += 1
        off = (state["i"] * 997) % len(block)
        rolled = np.concatenate([block[off:], block[:off]])
        reps = -(-n // len(block))
        out = np.empty(reps * len(block), np.int8)
        # ONE broadcast copy — np.tile degrades to ~10 MB/s on this host
        out.reshape(reps, len(block))[:] = rolled
        return out[:n].reshape(shape)

    # int8 values are ~uniform in [-127,127] (std ~73); scale sets weight std
    w_scale = np.float32(0.02 / 73.0)

    def q_leaf(s):
        sh = s.shape
        return {
            "q8": tile_i8(sh),
            "scale": np.full(sh[:-2] + sh[-1:], w_scale, np.float32),
        }

    layers = {}
    for name, s in shapes["layers"].items():
        if name.endswith("_norm") or len(s.shape) < 3:
            layers[name] = np.ones(s.shape, np.float32)
        else:
            layers[name] = q_leaf(s)
    D = cfg.hidden_size
    embed = tile_i8(shapes["embed"].shape).astype(np.float32) * w_scale
    # lm_head rows scaled so |h|~sqrt(D) after the final RMSNorm yields a
    # logit spread of ~2.5 — a frozen 0.02-std head caps the expressible
    # confidence (see data/synthetic.py::build_tiny_hf_checkpoint)
    head_scale = np.float32((2.5 / np.sqrt(D)) / 73.0)
    lm_head = tile_i8(shapes["lm_head"].shape).astype(np.float32) * head_scale
    return {
        "embed": embed,
        "lm_head": lm_head,
        "final_norm": np.ones(shapes["final_norm"].shape, np.float32),
        "layers": layers,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--max_steps", type=int, default=350)
    ap.add_argument("--save_steps", type=int, default=150)
    ap.add_argument("--log_steps", type=int, default=10)
    ap.add_argument("--movies", type=int, default=8)
    ap.add_argument("--prefetch", type=int, default=1,
                    help="build batch N+1 on a host thread during step N "
                         "(this box's single throttled core costs ~120 ms/"
                         "sample of collator time — synchronous building is "
                         "the measured cause of the B>1 throughput fall, "
                         "scripts/profile_train_batch.py)")
    args = ap.parse_args(argv)

    t_start = time.time()

    def phase(msg):
        print(f"# [{time.time() - t_start:7.1f}s] {msg}", file=sys.stderr, flush=True)

    phase("importing jax")
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import (
        AdapterConfig, DataConfig, LlamaConfig, LoraConfig, TrainConfig,
    )
    from revisionllm_tpu.data.collator import Collator
    from revisionllm_tpu.data.dataset import GroundingDataset
    from revisionllm_tpu.data.synthetic import make_synthetic_corpus
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.train import checkpoint as ckpt_lib
    from revisionllm_tpu.train import optimizer as opt_lib
    from revisionllm_tpu.train import trainer as trainer_lib
    from revisionllm_tpu.utils.logging import MetricLogger
    from revisionllm_tpu.utils.testing import FakeTokenizer

    os.makedirs(args.out, exist_ok=True)

    phase("synthetic corpus (768-dim MAD geometry)")
    corpus = os.path.join(args.out, "corpus")
    if not os.path.isfile(os.path.join(corpus, "train.json")):
        make_synthetic_corpus(
            corpus, n_train_movies=args.movies, n_val_movies=1, d=768,
            duration=540.0, fps=5.0, seed=11,
        )

    cfg = LlamaConfig(num_layers=args.layers)
    acfg = AdapterConfig(
        clip_adapter_text=True, hierarchy=False, feature_mode="temporal",
        hidden_size=cfg.hidden_size,
    )
    dcfg = DataConfig(
        num_frames=250, debug_window=125, feature_fps=5.0,
        neg_window=True, neg_samples=1.0,
        data_path=os.path.join(corpus, "train.json"),
        feat_folder=os.path.join(corpus, "features"),
        q_feat_dir=os.path.join(corpus, "queries"),
    )
    tcfg = TrainConfig(
        training_stage=2, lora=LoraConfig(r=64, alpha=128),
        gradient_checkpointing=True, per_device_batch_size=args.batch,
        learning_rate=1e-4, model_max_length=args.seq,
    )

    phase("host-side random 7B + int8 quantization")
    base_cache = os.path.join(args.out, f"base_int8_{args.layers}L.npz")
    rng_np = np.random.default_rng(0)
    if os.path.isfile(base_cache):
        import pickle

        with open(base_cache, "rb") as f:
            base_host = pickle.load(f)
        phase("loaded cached int8 base")
    else:
        base_host = _host_random_base(cfg, rng_np)
        import pickle

        with open(base_cache, "wb") as f:
            pickle.dump(base_host, f)
    phase("device transfer (int8 base)")

    def dev(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "q8" in v:
                out[k] = {"q8": jnp.asarray(v["q8"]), "scale": jnp.asarray(v["scale"])}
            elif isinstance(v, dict):
                out[k] = dev(v)
            else:
                out[k] = jnp.asarray(v, jnp.bfloat16)
        return out

    base = dev(base_host)
    del base_host

    vision = revisionllm.init_vision_params(
        acfg, jax.random.PRNGKey(1), d_in=768, dtype=jnp.bfloat16
    )
    trainable, frozen, _ = trainer_lib.build_trainable(
        cfg, tcfg, vision, jax.random.PRNGKey(2)
    )
    optimizer = opt_lib.make_optimizer(tcfg, total_steps=args.max_steps)
    opt_state = optimizer.init(trainable)

    tok = FakeTokenizer()
    dataset = GroundingDataset(
        dcfg.data_path, tok, dcfg, rng=np.random.default_rng(3),
        model_max_length=args.seq,
    )
    collator = Collator(max_len=args.seq, num_video_tokens=0, max_q_len=dcfg.max_q_l,
                        num_memory_tokens=0)

    start_step = 0
    latest = ckpt_lib.latest_checkpoint(args.out)
    if latest is not None:
        template = {"trainable": trainable, "opt_state": opt_state, "step": 0}
        restored = ckpt_lib.restore_checkpoint(latest, template)
        trainable, opt_state = restored["trainable"], restored["opt_state"]
        start_step = int(restored["step"])
        # free the init-time device arrays captured by `template`: keeping
        # both trees alive is +1.8 GB of dead HBM, which OOMed the resumed
        # process at the first async-save snapshot (fresh starts fit)
        del template, restored
        print(f"resumed from {latest} at step {start_step}", file=sys.stderr, flush=True)

    step_fn = jax.jit(
        trainer_lib.make_train_step(cfg, acfg, tcfg, optimizer),
        donate_argnums=(0, 3),
    )
    logger = MetricLogger(os.path.join(args.out, "train_log.jsonl"))
    order = np.random.default_rng(4).permutation(len(dataset))
    rng = jax.random.PRNGKey(5)

    def build_batch(step: int):
        idx = [int(order[(step * args.batch + j) % len(dataset)]) for j in range(args.batch)]
        b = collator([dataset[i] for i in idx])
        b.pop("iteration_step", None)
        b.pop("start_end_frame", None)
        return b

    batch_q = None
    if args.prefetch:
        import queue as queue_mod
        import threading

        batch_q = queue_mod.Queue(maxsize=2)

        def producer():
            for step in range(start_step, args.max_steps):
                batch_q.put(build_batch(step))

        threading.Thread(target=producer, daemon=True).start()

    phase(f"training {start_step} -> {args.max_steps} (compile on first step)")
    times, losses, save_stalls = [], [], []
    t_last = time.time()
    for step in range(start_step, args.max_steps):
        b = batch_q.get() if batch_q is not None else build_batch(step)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        rng, sub = jax.random.split(rng)
        trainable, opt_state, metrics = step_fn(
            trainable, frozen, base, opt_state, batch, sub
        )
        loss = float(metrics["loss"])  # sync point: true per-step wall time
        dt = time.time() - t_last
        t_last = time.time()
        times.append(dt)
        losses.append(loss)
        if (step + 1) % args.log_steps == 0 or step == start_step:
            logger.log(step=step + 1, loss=loss,
                       grad_norm=float(metrics["grad_norm"]), sec_per_step=dt)
            phase(f"step {step + 1}: loss {loss:.4f} ({dt*1e3:.0f} ms)")
        if (step + 1) % args.save_steps == 0 or step == args.max_steps - 1:
            # async: the D2H drain + relay-disk write overlaps the next train
            # steps. The call itself only stalls when the PREVIOUS save is
            # still draining (checkpoint.py bounds live snapshots to one);
            # that residual stall = max(0, drain - save interval), timed here
            # as its own series so step stats measure steps, not drain BW.
            t_save = time.time()
            ckpt_lib.save_checkpoint(
                args.out,
                {"trainable": trainable, "opt_state": opt_state, "step": step + 1},
                step + 1,
                block=False,
            )
            stall = time.time() - t_save
            save_stalls.append(round(stall, 1))
            t_last = time.time()  # keep the stall out of the next step's dt
            phase(
                f"checkpoint save dispatched at step {step + 1} "
                f"(stall {stall:.1f}s waiting on previous drain)"
            )

    phase("waiting for pending checkpoint commits")
    ckpt_lib.wait_for_checkpoints()
    steady = np.asarray(times[1:]) if len(times) > 1 else np.asarray(times)
    result = {
        "metric": "qlora_7b_train_tokens_per_sec_per_chip",
        "steps_this_run": len(times),
        "resumed_from": start_step,
        "step_ms_p50": round(float(np.median(steady)) * 1e3, 1),
        "step_ms_std": round(float(steady.std()) * 1e3, 1),
        "tokens_per_sec": round(args.batch * args.seq / float(np.median(steady)), 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(float(np.mean(losses[-10:])), 4),
        "save_stalls_s": save_stalls,
        "seq": args.seq, "batch": args.batch, "lora_r": tcfg.lora.r,
    }
    with open(os.path.join(args.out, "TRAIN_7B.json"), "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Why does batched QLoRA training throughput FALL with batch size?

Round-2 table (BENCH_NOTES "7B QLoRA"): 2684 tok/s at B=1 -> 2206 at B=4
(-18%), waved off as "MXU-bound through the flash VJP" — an explanation that
predicts FLAT, not falling. This script separates the two candidate causes
at the sustained-training geometry (int8 frozen base + LoRA r=64, seq 2048,
remat, flash VJP):

  host_ms    dataset+collator time to build one batch (this box has ONE
             throttled core; round-4 measured ~120 ms/sample of host time)
  device_ms  steady step time with PRE-BUILT device-resident batches
             (cycling 4 distinct batches; donated trainable/opt_state)
  loop_ms    host_ms + device_ms when built synchronously in the loop —
             the train_7b_sustained.py structure

If device_ms scales ~linearly with B while loop tokens/s falls, the
regression is the SYNCHRONOUS host collator, and the fix is the
--prefetch thread in train_7b_sustained.py (build batch N+1 during step N).

Run (TPU, ambient env):
  PYTHONPATH=/root/.axon_site:/root/repo \
      nohup python scripts/profile_train_batch.py --out /tmp/tbp > /tmp/tbp.log 2>&1 &
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tbp")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batches", type=str, default="1,2,4")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--split_fwd", action="store_true",
                    help="additionally time loss-forward-only and grad-only "
                         "programs per B (locates fwd vs bwd scaling)")
    args = ap.parse_args(argv)

    t0 = time.time()

    def phase(msg):
        print(f"# [{time.time() - t0:7.1f}s] {msg}", file=sys.stderr, flush=True)

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
    from revisionllm_tpu.train import optimizer as opt_lib
    from revisionllm_tpu.train import trainer as trainer_lib
    from revisionllm_tpu.utils.testing import FakeTokenizer

    import train_7b_sustained as sustained

    os.makedirs(args.out, exist_ok=True)
    corpus = os.path.join(args.out, "corpus")
    if not os.path.isfile(os.path.join(corpus, "train.json")):
        phase("synthetic corpus")
        make_synthetic_corpus(
            corpus, n_train_movies=8, n_val_movies=1, d=768,
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

    phase("int8 base (cache-aware)")
    base_cache = os.path.join(args.out, f"base_int8_{args.layers}L.npz")
    import pickle

    if os.path.isfile(base_cache):
        with open(base_cache, "rb") as f:
            base_host = pickle.load(f)
    else:
        base_host = sustained._host_random_base(cfg, np.random.default_rng(0))
        with open(base_cache, "wb") as f:
            pickle.dump(base_host, f)

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

    phase("device transfer")
    base = dev(base_host)
    del base_host

    tok = FakeTokenizer()
    dataset = GroundingDataset(
        dcfg.data_path, tok, dcfg, rng=np.random.default_rng(3),
        model_max_length=args.seq,
    )
    collator = Collator(max_len=args.seq, num_video_tokens=0,
                        max_q_len=dcfg.max_q_l, num_memory_tokens=0)

    results = []
    for B in (int(b) for b in args.batches.split(",")):
        tcfg = TrainConfig(
            training_stage=2, lora=LoraConfig(r=64, alpha=128),
            gradient_checkpointing=True, per_device_batch_size=B,
            learning_rate=1e-4, model_max_length=args.seq,
        )
        # fresh vision per B: the previous B's step_fn DONATED the trainable
        # tree (vision included) — reusing those buffers raises
        # "Array has been deleted"
        vision = revisionllm.init_vision_params(
            acfg, jax.random.PRNGKey(1), d_in=768, dtype=jnp.bfloat16
        )
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, tcfg, vision, jax.random.PRNGKey(2)
        )
        optimizer = opt_lib.make_optimizer(tcfg, total_steps=100)
        opt_state = optimizer.init(trainable)
        step_fn = jax.jit(
            trainer_lib.make_train_step(cfg, acfg, tcfg, optimizer),
            donate_argnums=(0, 3),
        )

        # host cost: build iters batches, timed
        t = time.time()
        host_batches = []
        for s in range(args.iters):
            idx = [(s * B + j) % len(dataset) for j in range(B)]
            b = collator([dataset[i] for i in idx])
            b.pop("iteration_step", None)
            b.pop("start_end_frame", None)
            host_batches.append(b)
        host_ms = (time.time() - t) / args.iters * 1e3

        # pre-stage 4 distinct device batches
        dev_batches = [
            {k: jnp.asarray(v) for k, v in b.items()} for b in host_batches[:4]
        ]
        rng = jax.random.PRNGKey(5)

        phase(f"B={B}: compile + warm")
        rng, sub = jax.random.split(rng)
        trainable, opt_state, metrics = step_fn(
            trainable, frozen, base, opt_state, dev_batches[0], sub
        )
        float(metrics["loss"])
        t = time.time()
        for s in range(args.iters):
            rng, sub = jax.random.split(rng)
            trainable, opt_state, metrics = step_fn(
                trainable, frozen, base, opt_state, dev_batches[s % 4], sub
            )
        float(metrics["loss"])  # drain
        device_ms = (time.time() - t) / args.iters * 1e3

        extra = {}
        if args.split_fwd:
            loss_fn = trainer_lib.make_loss_fn(cfg, acfg, tcfg)
            fwd = jax.jit(loss_fn)
            grad = jax.jit(jax.grad(loss_fn))
            for name, fn in (("fwd", fwd), ("grad", grad)):
                rng, sub = jax.random.split(rng)
                out = fn(trainable, frozen, base, dev_batches[0], sub)
                jax.tree.leaves(out)[0].block_until_ready()
                t = time.time()
                for s in range(args.iters):
                    rng, sub = jax.random.split(rng)
                    out = fn(trainable, frozen, base, dev_batches[s % 4], sub)
                np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
                extra[f"{name}_ms"] = round((time.time() - t) / args.iters * 1e3, 1)

        row = {
            "B": B,
            **extra,
            "host_ms": round(host_ms, 1),
            "device_ms": round(device_ms, 1),
            "loop_ms": round(host_ms + device_ms, 1),
            "tokens_per_sec_device": round(B * args.seq / (device_ms / 1e3), 1),
            "tokens_per_sec_loop": round(
                B * args.seq / ((host_ms + device_ms) / 1e3), 1
            ),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del trainable, opt_state, step_fn, dev_batches

    with open(os.path.join(args.out, "TRAIN_BATCH_PROFILE.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

"""Stage-2 hierarchical training at MAD geometry, measured on silicon
(VERDICT r4 #5): >=100 REAL steps with the hierarchy collator — ~100 windows
x 250 frames per sample through the ClipEncoder INSIDE the train graph,
training_stage=3 LoRA over the int8 frozen 7B — the heaviest reference
training path (scripts/mad/stage2_long_100.sh:49-51 budgets 8xA40 for it).

Reuses train_7b_sustained's int8 base + corpus scaffolding; the dataset is
the synthetic 768-dim corpus with hierarchy sampling (data/dataset.py
_hierarchy_item: disjoint negative mining, zoomed positives — the reference
dataset.py:563-623 rebuild). Host assembly of a 100-window sample costs
~100 dataset draws, so the batch builder runs on a prefetch thread
overlapping the device step (the round-5 fix measured in
scripts/profile_train_batch.py).

Run (TPU, ambient env):
  PYTHONPATH=/root/.axon_site:/root/repo nohup python \
      scripts/train_stage2_sustained.py --out /tmp/s2train > /tmp/s2train.log 2>&1 &
Writes <out>/TRAIN_STAGE2.json (appended), train_log.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import queue as queue_mod
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--windows", type=int, default=100)
    ap.add_argument("--max_steps", type=int, default=120)
    ap.add_argument("--log_steps", type=int, default=10)
    ap.add_argument("--movies", type=int, default=8)
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
    from revisionllm_tpu.train import optimizer as opt_lib
    from revisionllm_tpu.train import trainer as trainer_lib
    from revisionllm_tpu.utils.logging import MetricLogger
    from revisionllm_tpu.utils.testing import FakeTokenizer

    import train_7b_sustained as sustained

    os.makedirs(args.out, exist_ok=True)
    phase("synthetic corpus (768-dim MAD geometry)")
    corpus = os.path.join(args.out, "corpus")
    if not os.path.isfile(os.path.join(corpus, "train.json")):
        make_synthetic_corpus(
            corpus, n_train_movies=args.movies, n_val_movies=1, d=768,
            duration=540.0, fps=5.0, seed=11,
        )

    cfg = LlamaConfig(num_layers=args.layers)
    # the real ClipEncoder geometry (reference adapter/transformer.py:77-85)
    acfg = AdapterConfig(
        kind="clip_encoder", d_model=768, num_heads=8, num_layers=2,
        ffn_dim=2048, clip_adapter_text=True, hierarchy=True,
        feature_mode="cls", hidden_size=cfg.hidden_size,
    )
    dcfg = DataConfig(
        num_frames=250, debug_window=125, feature_fps=5.0,
        hierarchy=True, hierarchy_num_videos=args.windows,
        hierarchy_zoom=True, neg_window=True,
        data_path=os.path.join(corpus, "train.json"),
        feat_folder=os.path.join(corpus, "features"),
        q_feat_dir=os.path.join(corpus, "queries"),
    )
    # stage-2 sequences are short: prompt + <=100 window-CLS tokens
    seq = 256
    tcfg = TrainConfig(
        training_stage=3, lora=LoraConfig(r=64, alpha=128),
        gradient_checkpointing=True, per_device_batch_size=args.batch,
        learning_rate=1e-4, model_max_length=seq,
    )

    phase("int8 base (cache-aware)")
    import pickle

    base_cache = os.path.join(args.out, f"base_int8_{args.layers}L.npz")
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

    phase("device transfer (int8 base)")
    base = dev(base_host)
    del base_host

    vision = revisionllm.init_vision_params(
        acfg, jax.random.PRNGKey(1), d_in=768, dtype=jnp.bfloat16
    )
    # training_stage=3: fresh LoRA over the (already-merged) base — the
    # throughput run skips the stage-1 merge (weights are random anyway;
    # the MERGE path is exercised by the learning demo / train_cli)
    trainable, frozen, _ = trainer_lib.build_trainable(
        cfg, tcfg, vision, jax.random.PRNGKey(2)
    )
    optimizer = opt_lib.make_optimizer(tcfg, total_steps=args.max_steps)
    opt_state = optimizer.init(trainable)

    tok = FakeTokenizer()
    dataset = GroundingDataset(
        dcfg.data_path, tok, dcfg, rng=np.random.default_rng(3),
        model_max_length=seq,
    )
    collator = Collator(max_len=seq, num_video_tokens=0,
                        max_q_len=dcfg.max_q_l, num_memory_tokens=0)

    step_fn = jax.jit(
        trainer_lib.make_train_step(cfg, acfg, tcfg, optimizer),
        donate_argnums=(0, 3),
    )
    logger = MetricLogger(os.path.join(args.out, "train_log.jsonl"))
    order = np.random.default_rng(4).permutation(len(dataset))
    rng = jax.random.PRNGKey(5)

    def build_batch(step: int):
        idx = [int(order[(step * args.batch + j) % len(dataset)])
               for j in range(args.batch)]
        b = collator([dataset[i] for i in idx])
        b.pop("iteration_step", None)
        b.pop("start_end_frame", None)
        return b

    batch_q = queue_mod.Queue(maxsize=2)

    def producer():
        for step in range(args.max_steps):
            batch_q.put(build_batch(step))

    threading.Thread(target=producer, daemon=True).start()

    phase(f"training 0 -> {args.max_steps} (compile on first step)")
    times, losses, host_wait = [], [], []
    t_last = time.time()
    for step in range(args.max_steps):
        tq = time.time()
        b = batch_q.get()
        host_wait.append(time.time() - tq)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        rng, sub = jax.random.split(rng)
        trainable, opt_state, metrics = step_fn(
            trainable, frozen, base, opt_state, batch, sub
        )
        loss = float(metrics["loss"])  # sync: true per-step wall time
        dt = time.time() - t_last
        t_last = time.time()
        times.append(dt)
        losses.append(loss)
        if (step + 1) % args.log_steps == 0 or step == 0:
            logger.log(step=step + 1, loss=loss,
                       grad_norm=float(metrics["grad_norm"]), sec_per_step=dt)
            phase(f"step {step + 1}: loss {loss:.4f} ({dt*1e3:.0f} ms, "
                  f"host_wait {host_wait[-1]*1e3:.0f} ms)")

    steady = np.asarray(times[1:])
    frames = args.batch * args.windows * dcfg.num_frames
    result = {
        "metric": "stage2_hierarchy_train_step",
        "windows": args.windows, "frames_per_step": frames,
        "batch": args.batch, "layers": args.layers,
        "step_ms_p50": round(float(np.median(steady)) * 1e3, 1),
        "step_ms_std": round(float(steady.std()) * 1e3, 1),
        "host_wait_ms_p50": round(float(np.median(host_wait[1:])) * 1e3, 1),
        "windows_per_sec": round(
            args.batch * args.windows / float(np.median(steady)), 1
        ),
        "loss_first": round(losses[0], 4),
        "loss_last": round(float(np.mean(losses[-10:])), 4),
        "steps": len(times),
    }
    with open(os.path.join(args.out, "TRAIN_STAGE2.json"), "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

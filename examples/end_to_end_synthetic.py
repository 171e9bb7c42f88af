"""End-to-end walkthrough on synthetic data — no checkpoints or GPUs needed.

Exercises the full pipeline exactly as a MAD run would, with a tiny random
model and generated CLIP-like features:

  1. synthesize a feature store (RVFS) + annotation records
  2. train a few steps (stage-1 dense preset, LoRA + adapter)
  3. run stage-1 dense grounding eval -> JSONL predictions
  4. run stage-2 hierarchical retrieval eval -> JSONL predictions
  5. fuse + print final R@K/IoU metrics

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/end_to_end_synthetic.py
(~2 min on CPU; drop JAX_PLATFORMS to run on a TPU chip.)
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_dataset(root: str, n_queries: int = 4):
    from revisionllm_tpu.data.feature_store import RvfsWriter

    fps, dur = 2.0, 300.0
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(int(dur * fps), 16)).astype(np.float32)
    np.save(os.path.join(root, "movie1.npy"), feats)

    with RvfsWriter(os.path.join(root, "queries.rvfs")) as w:
        for k in range(n_queries):
            w.add(f"q{k}", {
                "token_features": rng.normal(size=(7, 16)).astype(np.float32),
                "cls_features": rng.normal(size=(16,)).astype(np.float32),
            })

    train_records = [
        {
            "id": "movie1",
            "query_id": f"q{k}",
            "conversations": [
                {"from": "human", "value": "<video>\nDuring which frames can we see event %d?" % k},
                {"from": "gpt", "value": "From <s0> to <e0>."},
            ],
            "meta": {"duration": dur, "token": {"<s0>": 60.0 + 20 * k, "<e0>": 70.0 + 20 * k}},
            "source": "mad",
        }
        for k in range(n_queries)
    ]
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump(train_records, f)

    eval_data = {
        f"q{k}": {
            "movie": "movie1",
            "movie_duration": dur,
            "timestamps": [60.0 + 20 * k, 70.0 + 20 * k],
            "query": f"event number {k}.",
        }
        for k in range(n_queries)
    }
    with open(os.path.join(root, "val.json"), "w") as f:
        json.dump(eval_data, f)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--train_steps", type=int, default=2)
    args = p.parse_args()
    root = args.workdir or tempfile.mkdtemp(prefix="revisionllm_demo_")
    os.makedirs(root, exist_ok=True)
    print(f"== workdir: {root}")

    print("== 1. synthesizing dataset")
    synthesize_dataset(root)

    print("== 2. training (tiny model, stage1_dense preset)")
    from revisionllm_tpu.train import train_cli

    out_dir = os.path.join(root, "ckpt")
    train_cli.main([
        "--preset", "stage1_dense",
        "--data_path", os.path.join(root, "train.json"),
        "--feat_folder", root,
        "--q_feat_dir", os.path.join(root, "queries.rvfs"),
        "--output_dir", out_dir,
        "--tiny_model",
        "--max_steps", str(args.train_steps),
        "--per_device_batch_size", "2",
        "--save_steps", str(args.train_steps),
        "--log_steps", "1",
    ])
    print(f"   artifacts: {sorted(os.listdir(out_dir))}")

    print("== 3. stage-1 dense grounding eval")
    import argparse as ap

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
    from revisionllm_tpu.eval import fusion, stage1, stage2
    from revisionllm_tpu.eval.engine import GroundingEngine
    from revisionllm_tpu.models import llama, revisionllm
    from tests.test_dataset import FakeTokenizer

    cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
    tok = FakeTokenizer()
    for i in range(300):
        tok._id(str(i))

    def make_engine(hierarchy: bool, batch: int, stride: int, zooms=(4, 2, 1)):
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True,
            hierarchy=hierarchy, feature_mode="cls" if hierarchy else "temporal",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
        ecfg = EvalConfig(
            debug_window=30, num_frames=16, feature_fps=2.0, batch=batch,
            stride=stride, max_new_tokens=6, hierarchy_zooms=zooms,
        )
        return GroundingEngine(cfg, acfg, params, vision, tok, ecfg)

    s1_args = ap.Namespace(
        data_path=os.path.join(root, "val.json"), feat_folder=root,
        q_feat_dir=os.path.join(root, "queries.rvfs"),
        log_path=os.path.join(root, "s1"),
        debug_window=30, num_frames=16, feature_fps=2.0, batch=4,
        split=0, total_split=1, score="mean_entropy", score_merge="multiply",
        normalize=True, topk_pool=True, skip_small_videos=True,
        mad_prompt="mad_grounding", max_new_tokens=6, debug=True, task="grounding",
    )
    print("  ", stage1.run(s1_args, make_engine(False, 4, 2)))

    print("== 4. stage-2 hierarchical retrieval eval")
    s2_args = ap.Namespace(
        data_path=os.path.join(root, "val.json"), feat_folder=root,
        q_feat_dir=os.path.join(root, "queries.rvfs"),
        log_path=os.path.join(root, "s2"), grounding_path=None,
        debug_window=30, num_frames=16, feature_fps=2.0, batch=8, stride=5,
        split=0, total_split=1, distributed_retrieval=1, single=True,
        max_new_tokens=6, seed=42, debug=True,
    )
    print("  ", stage2.run(s2_args, make_engine(True, 8, 5, zooms=(2, 1))))

    print("== 5. fusion + final metrics")
    metrics = fusion.main([
        "--grounding_path", os.path.join(root, "s1"),
        "--retrieval_path", os.path.join(root, "s2"),
        "--distributed_grounding", "1", "--distributed_retrieval", "1",
    ])
    print("== done. metrics:", {k: round(v, 2) for k, v in list(metrics.items())[:5]})


if __name__ == "__main__":
    main()

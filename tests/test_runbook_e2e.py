"""Turnkey runbook harness test (VERDICT round-1 item 5).

Builds a REAL (tiny) HF Llama checkpoint + fast tokenizer on disk, reference-
format LoRA/adapter artifacts via our own exporter, and h5 feature files in
MAD's distribution format — then runs scripts/run_mad_eval.py end-to-end:
convert -> stage-1 -> stage-2 -> fusion -> result.json. This is the exact
chain a real checkpoint drop exercises (RUNBOOK.md), with every loader branch
(HF weights, PEFT LoRA merge, non_lora_trainables projector surgery, h5
conversion, text-feature store) live.
"""

import json
import os
import sys

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
h5py = pytest.importorskip("h5py")
torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


WORDS = (
    ["<unk>", "<s>", "</s>", "<video>", "<memory>"]
    + [str(i) for i in range(260)]
    + "from to not present in video during which frames can we see a the dog "
      "red car someone opens door happen does it when A chat between curious "
      "user and an artificial intelligence assistant . The gives helpful , "
      "detailed polite answers questions USER ASSISTANT : ? ' s".split()
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_llama")
    vocab = {w: i for i, w in enumerate(dict.fromkeys(WORDS))}

    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>",
    )
    fast.save_pretrained(str(d))

    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    cfg = HFLlamaConfig(
        vocab_size=len(vocab), hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(str(d))
    return str(d)


def _make_lora(cfg_llama, key):
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import LoraConfig

    lcfg = LoraConfig(r=4, alpha=8)
    L, D = cfg_llama.num_layers, cfg_llama.hidden_size
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    layers = {}
    for name in ("q_proj", "v_proj"):
        layers[name] = {
            "a": jax.random.normal(k1, (L, D, 4), jnp.float32) * 0.02,
            "b": jax.random.normal(k2, (L, 4, D), jnp.float32) * 0.02,
        }
    return {"layers": layers}, lcfg


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory, hf_dir):
    """Stage-1 (mlp projector) and stage-2 (ClipEncoder) artifact dirs in the
    reference on-disk format, written by our exporter."""
    import jax

    from revisionllm_tpu.config import AdapterConfig
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.models.convert import llama_config_from_hf
    from revisionllm_tpu.train.checkpoint import export_reference_artifacts

    cfg = llama_config_from_hf(hf_dir)
    root = tmp_path_factory.mktemp("artifacts")

    s1 = root / "stage1_dense"
    lora1, lcfg1 = _make_lora(cfg, 1)
    rng = np.random.default_rng(0)
    mlp_proj = {
        "w": rng.normal(size=(16, 64)).astype(np.float32) * 0.1,
        "b": np.zeros(64, np.float32),
    }
    export_reference_artifacts(str(s1), lora1, lcfg1,
                               vision={"mm_projector": mlp_proj})

    s2 = root / "stage2_long"
    lora2, lcfg2 = _make_lora(cfg, 2)
    acfg = AdapterConfig(
        d_model=16, num_heads=4, num_layers=2, ffn_dim=32, hidden_size=64,
        clip_adapter_text=True, hierarchy=True, feature_mode="cls",
    )
    vision2 = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(3), d_in=16)
    export_reference_artifacts(str(s2), lora2, lcfg2, vision=vision2)
    return {"stage1": str(s1), "stage2": str(s2), "acfg": acfg}


@pytest.fixture(scope="module")
def mad_data(tmp_path_factory):
    """Frame + text features in MAD's h5 distribution format + annotations."""
    root = tmp_path_factory.mktemp("mad")
    rng = np.random.default_rng(5)
    fps, dur = 2.0, 32.0
    with h5py.File(root / "frames.h5", "w") as f:
        f.create_dataset("movie1", data=rng.normal(
            size=(int(dur * fps), 16)).astype(np.float32))
    with h5py.File(root / "texts.h5", "w") as f:
        for qid in ("q1", "q2"):
            g = f.create_group(qid)
            g.create_dataset("token_features",
                             data=rng.normal(size=(5, 16)).astype(np.float32))
            g.create_dataset("cls_features",
                             data=rng.normal(size=(16,)).astype(np.float32))
    ann = {
        "q1": {"movie": "movie1", "movie_duration": dur,
               "timestamps": [10.0, 15.0], "sentence": "a red car."},
        "q2": {"movie": "movie1", "movie_duration": dur,
               "timestamps": [20.0, 25.0], "sentence": "someone opens a door."},
    }
    with open(root / "val.json", "w") as f:
        json.dump(ann, f)
    return str(root)


class TestRunbookEndToEnd:
    @pytest.mark.slow
    def test_full_chain(self, hf_dir, artifacts, mad_data, tmp_path):
        import run_mad_eval

        out_dir = str(tmp_path / "out")
        metrics = run_mad_eval.main([
            "--model_base", hf_dir,
            "--stage1_lora", artifacts["stage1"],
            "--stage2_lora", artifacts["stage2"],
            "--pretrain_clip_adapter",
            os.path.join(artifacts["stage2"], "non_lora_trainables.bin"),
            "--frame_features", os.path.join(mad_data, "frames.h5"),
            "--text_features", os.path.join(mad_data, "texts.h5"),
            "--annotations", os.path.join(mad_data, "val.json"),
            "--out_dir", out_dir,
            "--debug_window", "20", "--num_frames", "16",
            "--feature_fps", "2.0",
            "--stage1_batch", "4", "--stage2_batch", "8", "--stride", "5",
            "--adapter_d_model", "16", "--adapter_heads", "4",
            "--adapter_layers", "2", "--adapter_ffn", "32",
        ])
        assert os.path.isfile(os.path.join(out_dir, "result.json"))
        assert "mIoU" in metrics
        # both sub-stages produced resumable JSONL logs
        for sub in ("grounding", "retrieval"):
            logs = os.path.join(out_dir, sub, "predictions_streaming_0.txt")
            assert os.path.isfile(logs)
            recs = [json.loads(l) for l in open(logs)]
            assert {r["query_id"] for r in recs} == {"q1", "q2"}
        # stage-2 logs carry the full info schema incl. score_cos
        info = recs[0]["info"]
        for k in ("frames", "iou", "score_cos", "mean_entropy",
                  "max_entropy", "hierarchy_zooms"):
            assert k in info


class TestLoaderServingQuant:
    def test_loader_quantizes_when_forced(self, hf_dir, artifacts, monkeypatch):
        """REVISIONLLM_QUANT=int8 routes the converted base through host
        quantization (the TPU serving default; CPU default is 'none')."""
        import argparse

        monkeypatch.setenv("REVISIONLLM_QUANT", "int8")
        from revisionllm_tpu.eval.loader import build_engine_from_args

        args = argparse.Namespace(
            model_base=hf_dir, stage2=artifacts["stage1"],
            pretrain_clip_adapter=None, pretrain_mm_mlp_adapter=None,
            stage3=None, clip_adapter=False, clip_adapter_text=False,
            hierarchy=False, debug_window=20, num_frames=16, feature_fps=2.0,
            batch=4, stride=2, split=0, total_split=1, max_new_tokens=4,
        )
        engine = build_engine_from_args(args)
        w = engine.params["layers"]["q_proj"]
        assert isinstance(w, dict) and "q8" in w
        import numpy as np

        assert np.asarray(w["q8"]).dtype == np.int8
        # norms/embed stay dense
        assert not isinstance(engine.params["layers"]["attn_norm"], dict)

    def test_loader_dense_by_default_on_cpu(self, hf_dir, artifacts, monkeypatch):
        import argparse

        monkeypatch.delenv("REVISIONLLM_QUANT", raising=False)
        from revisionllm_tpu.eval.loader import build_engine_from_args

        args = argparse.Namespace(
            model_base=hf_dir, stage2=artifacts["stage1"],
            pretrain_clip_adapter=None, pretrain_mm_mlp_adapter=None,
            stage3=None, clip_adapter=False, clip_adapter_text=False,
            hierarchy=False, debug_window=20, num_frames=16, feature_fps=2.0,
            batch=4, stride=2, split=0, total_split=1, max_new_tokens=4,
        )
        engine = build_engine_from_args(args)
        assert not isinstance(engine.params["layers"]["q_proj"], dict)


class TestLoaderServingLayout:
    def test_loader_packs_serving_layout(self, hf_dir, artifacts, monkeypatch):
        """REVISIONLLM_SERVE=1 (with int8) packs layer weights into the
        contiguous serving-chunk layout in host RAM; prefill consumes the
        pack through q8_apply's chunked dispatch, so the engine stays
        usable even where the serve decode kernel is gated off (CPU)."""
        import argparse

        import numpy as np

        monkeypatch.setenv("REVISIONLLM_QUANT", "int8")
        monkeypatch.setenv("REVISIONLLM_SERVE", "1")
        from revisionllm_tpu.eval.loader import build_engine_from_args

        args = argparse.Namespace(
            model_base=hf_dir, stage2=artifacts["stage1"],
            pretrain_clip_adapter=None, pretrain_mm_mlp_adapter=None,
            stage3=None, clip_adapter=False, clip_adapter_text=False,
            hierarchy=False, debug_window=20, num_frames=16, feature_fps=2.0,
            batch=4, stride=2, split=0, total_split=1, max_new_tokens=4,
        )
        engine = build_engine_from_args(args)
        w = engine.params["layers"]["q_proj"]
        assert isinstance(w, dict) and "q8c" in w
        assert np.asarray(w["q8c"]).dtype == np.int8
        assert "q8r" in engine.params["layers"]["down_proj"]
        # the packed pytree replaced the standard tree — no [L, D, N] copy
        assert "q8" not in w

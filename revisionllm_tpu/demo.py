"""Interactive demo: video chat with the grounding model.

Parity target: reference revisionllm/demo_gradio.py (upload video -> extract
100 frames -> CLIP encode -> multi-turn chat). This rebuild offers the same
flow as (a) a terminal REPL that works everywhere, and (b) the same gradio UI
when the `gradio` package is present (it is not baked into this image, so the
import is gated).

Feature extraction runs through data/feature_extraction.py (ffmpeg decode +
jnp CLIP); pre-extracted .npy feature files are accepted directly so the demo
also runs without any video tooling.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional, Tuple

import numpy as np

from revisionllm_tpu.conversation import CONV_VICUNA_V1
from revisionllm_tpu.inference import inference


def load_video_features(
    path: str, clip_extractor=None, num_frames: int = 100
) -> np.ndarray:
    """mp4 (ffmpeg + CLIP) or .npy feature file -> [T, 768]."""
    if path.endswith(".npy"):
        feats = np.load(path)
    else:
        from revisionllm_tpu.data.feature_extraction import (
            decode_frames,
            linspace_sample,
            preprocess_frames,
        )

        if clip_extractor is None:
            raise RuntimeError("raw video input needs a CLIP extractor (--clip_path)")
        frames = decode_frames(path, target_fps=0.0 or 1.0)
        frames = linspace_sample(frames, num_frames)
        feats = clip_extractor.encode_images(preprocess_frames(frames))
    idx = np.linspace(0, len(feats) - 1, num_frames, dtype=np.int32)
    return feats[idx]


class ChatSession:
    """Multi-turn chat state over one video (the gradio_answer loop,
    reference demo_gradio.py:120-148)."""

    def __init__(self, engine_parts, features: np.ndarray, max_new_tokens: int = 128):
        (self.llama_cfg, self.adapter_cfg, self.params, self.vision,
         self.tokenizer) = engine_parts
        self.features = features
        self.history: List[Tuple[str, str]] = []
        self.max_new_tokens = max_new_tokens

    def ask(self, question: str) -> str:
        if not self.history:
            question = "<video>\n" + question
        answer, _ = inference(
            self.llama_cfg, self.adapter_cfg, self.params, self.vision,
            self.tokenizer, self.features[None], question,
            max_new_tokens=self.max_new_tokens,
            history=self.history,
        )
        self.history.append((question, answer))
        return answer

    def ask_stream(self, question: str):
        """Yield the growing answer text token by token (the reference
        demo's TextStreamer behavior, demo_gradio.py:133-141)."""
        from revisionllm_tpu.inference import inference_stream

        if not self.history:
            question = "<video>\n" + question
        answer = ""
        for answer in inference_stream(
            self.llama_cfg, self.adapter_cfg, self.params, self.vision,
            self.tokenizer, self.features[None], question,
            max_new_tokens=self.max_new_tokens, history=self.history,
        ):
            yield answer
        self.history.append((question, answer))


def repl(session: ChatSession) -> None:
    print("video loaded — ask questions (empty line to exit)")
    while True:
        try:
            q = input("user> ").strip()
        except EOFError:
            return
        if not q:
            return
        # stream tokens as they decode (reference demo_gradio.py:133-141)
        print("assistant> ", end="", flush=True)
        shown = 0
        answer = ""
        for answer in session.ask_stream(q):
            print(answer[shown:], end="", flush=True)
            shown = len(answer)
        print()


def launch_gradio(make_session, host: str = "0.0.0.0", port: int = 7860):
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; use the terminal REPL", file=sys.stderr)
        return None

    state = {"session": None}

    def upload(video_file):
        state["session"] = make_session(video_file)
        return "video processed — ask away"

    def answer(question, chat):
        if state["session"] is None:
            return chat + [(question, "upload a video first")]
        return chat + [(question, state["session"].ask(question))]

    with gr.Blocks() as demo:
        video = gr.File(label="video or .npy features")
        status = gr.Textbox()
        chat = gr.Chatbot()
        box = gr.Textbox(label="question")
        video.upload(upload, video, status)
        box.submit(answer, [box, chat], chat)
    demo.launch(server_name=host, server_port=port)
    return demo


def main(argv=None):
    p = argparse.ArgumentParser(description="revisionllm_tpu demo")
    p.add_argument("--model_base", required=True)
    p.add_argument("--pretrain_mm_mlp_adapter", default=None)
    p.add_argument("--pretrain_clip_adapter", default=None)
    p.add_argument("--stage2", default=None)
    p.add_argument("--stage3", default=None)
    p.add_argument("--video", required=True, help="mp4 or .npy feature file")
    p.add_argument("--clip_path", default=None, help="HF CLIP dir for raw video")
    p.add_argument("--gradio", action="store_true")
    p.add_argument("--web", action="store_true",
                   help="stdlib web UI with token streaming (no gradio needed)")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address for --web (pass 0.0.0.0 to expose; "
                        "the endpoint accepts unauthenticated uploads)")
    args = p.parse_args(argv)

    from revisionllm_tpu.eval.loader import adapter_cfg_from_args
    from revisionllm_tpu.models.convert import jnp_tree, load_pretrained

    adapter_cfg = adapter_cfg_from_args(args)
    llama_cfg, params, vision = load_pretrained(
        args.model_base, adapter_cfg,
        mm_projector_path=args.pretrain_clip_adapter or args.pretrain_mm_mlp_adapter,
        stage2_lora=args.stage2, stage3_lora=args.stage3,
    )
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.model_base, use_fast=True)
    params, vision = jnp_tree(params), jnp_tree(vision)

    clip_extractor = None
    if args.clip_path:
        from revisionllm_tpu.data.feature_extraction import ClipFeatureExtractor
        from revisionllm_tpu.models.clip import convert_hf_clip
        from revisionllm_tpu.models.convert import load_hf_llama_state

        clip_state = load_hf_llama_state(args.clip_path)
        clip_extractor = ClipFeatureExtractor(jnp_tree(convert_hf_clip(clip_state)))

    def make_session(video_path):
        feats = load_video_features(video_path, clip_extractor)
        return ChatSession(
            (llama_cfg, adapter_cfg, params, vision, tokenizer), feats
        )

    if args.web:
        from revisionllm_tpu.webdemo import launch_web

        launch_web(make_session, host=args.host, port=args.port)
    elif args.gradio:
        launch_gradio(make_session)
    else:
        repl(make_session(args.video))


if __name__ == "__main__":
    main()

"""Single-call inference API.

Parity with reference revisionllm/inference.py:28-75 `inference()`: build the
v1 prompt around the user query (appending '<memory>' when a visual memory is
supplied), tokenize with sentinel splicing, repeat the prompt across the
window batch, generate with confidence capture, and strip the stop string.

The heavy lifting is the compiled path in models/revisionllm.py; this module
is the thin host-facing convenience the reference exposes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.config import AdapterConfig, LlamaConfig
from revisionllm_tpu.conversation import CONV_VICUNA_V1
from revisionllm_tpu.models import revisionllm
from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
from revisionllm_tpu.tokenization import tokenizer_image_token


def inference(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    params: Dict[str, Any],
    vision_params: Dict[str, Any],
    tokenizer,
    image: np.ndarray,
    query: str,
    query_feats: Optional[np.ndarray] = None,
    query_valid: Optional[np.ndarray] = None,
    visual_memory: Optional[np.ndarray] = None,
    prefix_memory_ids: Optional[np.ndarray] = None,
    *,
    eos_id: int = 2,
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    return_list: bool = False,
    history: Optional[List[Tuple[str, str]]] = None,
) -> Tuple[Union[str, List[str]], Dict[str, Any]]:
    """image: [B, T, d] window batch (or [B, V, T, d] hierarchy).

    `history` is a list of prior (user, assistant) turns for multi-turn chat
    (the demo path, reference demo_gradio.py:120-148). Returns (answers, raw
    output dict). answers is a string when B == 1 and return_list is False
    (parity: inference.py:73-75).
    """
    if visual_memory is not None:
        query = query + "<memory>"
    conv = CONV_VICUNA_V1
    msgs: List[Tuple[str, Optional[str]]] = []
    for u, a in history or []:
        msgs.append((conv.roles[0], u))
        msgs.append((conv.roles[1], a))
    msgs.append((conv.roles[0], query))
    msgs.append((conv.roles[1], None))
    prompt = conv.prompt(msgs)
    ids = tokenizer_image_token(prompt, tokenizer)

    B = image.shape[0]
    num_video = image.shape[1]  # windows (hierarchy) or frames (dense)

    memory_tokens = None
    num_memory = 0
    if visual_memory is not None:
        mem = np.asarray(visual_memory)
        if mem.ndim == 2:
            mem = mem[:, None]  # [B, 1, d]
        proj = vision_params["mm_projector"]
        if adapter_cfg.kind == "mlp":
            memory_tokens = jnp.asarray(mem) @ proj["w"] + proj["b"]
        else:
            # the reference calls the adapter MODULE on the memory clip
            # exactly like a video window (vtimellm_arch.py:221-222:
            # `self.get_model().mm_projector(vis_mem)`); for a ClipEncoder
            # projector that is the temporal per-frame encoding. (Trained
            # stream configs all use the mlp projector; this keeps the API
            # surface of the reference for the untrained combination.)
            import dataclasses as _dc

            dense_cfg = _dc.replace(
                adapter_cfg, hierarchy=False, feature_mode="temporal"
            )
            memory_tokens = revisionllm.encode_video(
                dense_cfg, vision_params, jnp.asarray(mem, jnp.float32)
            )
        if prefix_memory_ids is not None:
            from revisionllm_tpu.models.llama import embed_tokens

            prefix_emb = embed_tokens(params, jnp.asarray(prefix_memory_ids))
            if prefix_emb.ndim == 2:
                prefix_emb = prefix_emb[None]
            prefix_emb = jnp.broadcast_to(
                prefix_emb, (B, prefix_emb.shape[-2], prefix_emb.shape[-1])
            )
            memory_tokens = jnp.concatenate(
                [prefix_emb.astype(memory_tokens.dtype), memory_tokens], axis=1
            )
        num_memory = int(memory_tokens.shape[1])

    max_len = len(ids) - 1 + num_video + num_memory + max_new_tokens + 8
    plan = build_splice_plan(ids, num_video, max_len, num_memory_tokens=num_memory)
    plan_np = stack_plans([plan] * B)
    plan_j = {k: jnp.asarray(v) for k, v in plan_np.items()}

    dtype = jnp.dtype(llama_cfg.dtype)
    qf = jnp.asarray(query_feats, dtype) if query_feats is not None else None
    qv = jnp.asarray(query_valid) if query_valid is not None else None

    out = revisionllm.generate_grounding(
        llama_cfg, adapter_cfg, params, vision_params, plan_j,
        jnp.asarray(image, dtype), qf, qv, memory_tokens=memory_tokens,
        eos_id=eos_id, max_new_tokens=max_new_tokens, temperature=temperature,
    )

    stop = CONV_VICUNA_V1.stop_str
    answers: List[str] = []
    tokens = np.asarray(out["tokens"])
    valid = np.asarray(out["valid"])
    for row, v in zip(tokens, valid):
        keep = [int(t) for t, ok in zip(row, v) if ok and int(t) != eos_id]
        text = tokenizer.decode(keep, skip_special_tokens=True).strip()
        if text.endswith(stop):
            text = text[: -len(stop)].strip()
        answers.append(text)

    if len(answers) == 1 and not return_list:
        return answers[0], out
    return answers, out


def inference_stream(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    params: Dict[str, Any],
    vision_params: Dict[str, Any],
    tokenizer,
    image: np.ndarray,
    query: str,
    query_feats: Optional[np.ndarray] = None,
    query_valid: Optional[np.ndarray] = None,
    *,
    eos_id: int = 2,
    max_new_tokens: int = 64,
    history: Optional[List[Tuple[str, str]]] = None,
):
    """Token-by-token variant of `inference` (B=1): yields incremental text
    as each token decodes — the role of the reference demo's TextStreamer
    (demo_gradio.py:133-141). The final yielded string is the full answer."""
    conv = CONV_VICUNA_V1
    msgs: List[Tuple[str, Optional[str]]] = []
    for u, a in history or []:
        msgs.append((conv.roles[0], u))
        msgs.append((conv.roles[1], a))
    msgs.append((conv.roles[0], query))
    msgs.append((conv.roles[1], None))
    ids = tokenizer_image_token(conv.prompt(msgs), tokenizer)

    B = image.shape[0]
    assert B == 1, "streaming decode is single-row (demo path)"
    num_video = image.shape[1]
    max_len = len(ids) - 1 + num_video + max_new_tokens + 8
    plan = build_splice_plan(ids, num_video, max_len)
    plan_j = {k: jnp.asarray(v) for k, v in stack_plans([plan]).items()}

    dtype = jnp.dtype(llama_cfg.dtype)
    qf = jnp.asarray(query_feats, dtype) if query_feats is not None else None
    qv = jnp.asarray(query_valid) if query_valid is not None else None
    video_tokens = revisionllm.encode_video(
        adapter_cfg, vision_params, jnp.asarray(image, dtype), qf, qv
    )
    embeds, positions, lengths = revisionllm.assemble_inputs(
        params, plan_j, video_tokens, dtype=dtype
    )

    from revisionllm_tpu.models.generation import generate_stream

    stop = CONV_VICUNA_V1.stop_str
    toks: List[int] = []
    for token in generate_stream(
        llama_cfg, params, embeds, positions, lengths,
        eos_id=eos_id, max_new_tokens=max_new_tokens,
    ):
        toks.append(token)
        text = tokenizer.decode(toks, skip_special_tokens=True).strip()
        if text.endswith(stop):
            yield text[: -len(stop)].strip()
            return
        yield text

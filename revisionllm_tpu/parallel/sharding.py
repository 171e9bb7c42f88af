"""Parameter sharding rules (FSDP + tensor parallel).

The ZeRO-3 equivalent demanded by SURVEY.md §2.6: every large matrix is
sharded over the `fsdp` axis (GSPMD all-gathers shards just-in-time per
layer, the same communication schedule DeepSpeed implements imperatively) and
over the `tensor` axis in megatron orientation:

  column-parallel (shard output dim): q/k/v/gate/up projections, lm_head
  row-parallel   (shard input  dim): o_proj, down_proj

Layer matrices are stacked [L, din, dout]; the layer axis is never sharded so
`lax.scan` slices locally.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
ROW_PARALLEL = {"o_proj", "down_proj"}


def llama_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching models/llama.init_params structure.

    Quantized {'q8','scale'} leaves (int8 frozen-base training / serving)
    get the matrix spec on values and the output-channel sharding on the
    per-channel scale row."""
    layer_specs = {}
    for name, w in params["layers"].items():
        if name in COLUMN_PARALLEL:
            spec = P(None, "fsdp", "tensor")
        elif name in ROW_PARALLEL:
            spec = P(None, "tensor", "fsdp")
        else:  # norms [L, D]
            layer_specs[name] = P(None, None)
            continue
        if isinstance(w, dict) and "q8" in w:
            layer_specs[name] = {"q8": spec, "scale": P(None, spec[2])}
        else:
            layer_specs[name] = spec
    lm = params.get("lm_head")
    lm_spec = (
        {"q8": P("fsdp", "tensor"), "scale": P("tensor")}
        if isinstance(lm, dict) and "q8" in lm
        else P("fsdp", "tensor")
    )
    return {
        "embed": P("fsdp", "tensor"),
        "layers": layer_specs,
        "final_norm": P(None),
        "lm_head": lm_spec,
    }


def lora_param_specs(lora: Dict[str, Any]) -> Dict[str, Any]:
    """LoRA A/B are tiny (r=64): shard only the non-rank dim over fsdp."""
    layers = {}
    for name in lora["layers"]:
        layers[name] = {"a": P(None, "fsdp", None), "b": P(None, None, "fsdp")}
    return {"layers": layers}


def vision_param_specs(vision: Dict[str, Any]) -> Dict[str, Any]:
    """Adapter params are small (~20M): replicate everything."""
    return jax.tree.map(lambda _: P(), vision)


def tree_shardings(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Dict[str, Any], spec_tree: Any) -> Dict[str, Any]:
    shardings = tree_shardings(mesh, spec_tree)
    return jax.tree.map(jax.device_put, params, shardings)

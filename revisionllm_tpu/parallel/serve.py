"""Multi-chip serving: shard the generate program over an ICI mesh.

The BASELINE north-star runs all hierarchical levels of one video as a single
compiled program sharded across a mesh. Weights shard per
parallel/sharding.py (FSDP + megatron TP); the window batch shards over the
(data, fsdp) axes. GSPMD inserts the collectives — generate() itself is
unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from revisionllm_tpu.parallel import sharding as shard_lib
from revisionllm_tpu.parallel.mesh import BATCH_AXES


def shard_params_for_inference(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place backbone params according to the FSDP/TP specs. Quantized
    {'q8','scale'} leaves shard like their dense counterparts (scale
    replicated along the removed axis)."""

    def spec_for(name, leaf_name=None):
        if name in shard_lib.COLUMN_PARALLEL:
            return P(None, "fsdp", "tensor") if leaf_name != "scale" else P(None, "tensor")
        if name in shard_lib.ROW_PARALLEL:
            return P(None, "tensor", "fsdp") if leaf_name != "scale" else P(None, "fsdp")
        return P()

    placed_layers = {}
    for name, w in params["layers"].items():
        if isinstance(w, dict) and "q8" in w:
            placed_layers[name] = {
                "q8": jax.device_put(w["q8"], NamedSharding(mesh, spec_for(name))),
                "scale": jax.device_put(w["scale"], NamedSharding(mesh, spec_for(name, "scale"))),
            }
        else:
            placed_layers[name] = jax.device_put(w, NamedSharding(mesh, spec_for(name)))

    def head_spec(w, spec):
        if isinstance(w, dict) and "q8" in w:
            return {
                "q8": jax.device_put(w["q8"], NamedSharding(mesh, spec)),
                "scale": jax.device_put(w["scale"], NamedSharding(mesh, P(spec[1]))),
            }
        return jax.device_put(w, NamedSharding(mesh, spec))

    return {
        "embed": jax.device_put(params["embed"], NamedSharding(mesh, P("fsdp", "tensor"))),
        "layers": placed_layers,
        "final_norm": jax.device_put(params["final_norm"], NamedSharding(mesh, P())),
        "lm_head": head_spec(params["lm_head"], P("fsdp", "tensor")),
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES))


def make_sharded_generate(cfg, mesh: Mesh, **generate_kwargs):
    """jit generation.generate over the mesh: window batch split on the
    (data, fsdp) axes, weights gathered/partitioned by GSPMD per their specs."""
    from revisionllm_tpu.models import generation

    bs = batch_sharding(mesh)

    def run(params, embeds, positions, prompt_lens):
        embeds = jax.lax.with_sharding_constraint(embeds, bs)
        return generation.generate(
            cfg, params, embeds, positions, prompt_lens, **generate_kwargs
        )

    return jax.jit(run)

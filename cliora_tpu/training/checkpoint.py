"""Checkpointing, including reference (PyTorch) state_dict interop.

Native format: ``.npz`` of flat ``a/b/c`` paths -> float32 arrays, plus an
optional pickled optimizer state (an improvement over the reference, which
never checkpoints optimizer/RNG state -- cliora/net/trainer.py:383-435,
SURVEY.md section 5).

Interop: the reference saves ``{'state_dict': <torch name->tensor>}`` via
``torch.save``.  Because our linear layers keep the torch ``(out, in)``
weight layout, the mapping is purely a rename (no transposes).  The loader
reproduces the reference's tolerant semantics: strip the DDP ``module.``
prefix, ignore unknown keys, keep current values for missing keys
(zero-init ImageEncoder thus survives a DIORA->CLIORA warm start), and
optionally keep the current embedding table (reference:
cliora/net/trainer.py:400-435).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"

# our path -> reference torch state_dict name (diora core; share=True
# aliases outside_* to the same tensors in the reference state_dict)
_TORCH_NAME = {
    "embed/embeddings": "embed.embeddings.weight",
    "embed/mat": "embed.mat",
    "embed/mat1": "embed.mat1",
    "reconstruct/mat": "reconstruct_softmax_loss.mat",
    "img_encoder/fc/w": "img_encoder.fc.weight",
    "img_encoder/fc/b": "img_encoder.fc.bias",
    "img_encoder/fc_vis/w": "img_encoder.fc_vis.weight",
    "img_encoder/fc_vis/b": "img_encoder.fc_vis.bias",
    "diora/inside_score/mat": "diora.inside_score_func.mat",
    "diora/inside_compose/leaf_fc/w": "diora.inside_compose_func.leaf_fc.weight",
    "diora/inside_compose/leaf_fc/b": "diora.inside_compose_func.leaf_fc.bias",
    "diora/inside_compose/fc0/w": "diora.inside_compose_func.h_fcs.0.weight",
    "diora/inside_compose/fc0/b": "diora.inside_compose_func.h_fcs.0.bias",
    "diora/inside_compose/fc1/w": "diora.inside_compose_func.h_fcs.2.weight",
    "diora/inside_compose/fc1/b": "diora.inside_compose_func.h_fcs.2.bias",
    "diora/outside_score/mat": "diora.outside_score_func.mat",
    "diora/outside_compose/fc0/w": "diora.outside_compose_func.h_fcs.0.weight",
    "diora/outside_compose/fc0/b": "diora.outside_compose_func.h_fcs.0.bias",
    "diora/outside_compose/fc1/w": "diora.outside_compose_func.h_fcs.2.weight",
    "diora/outside_compose/fc1/b": "diora.outside_compose_func.h_fcs.2.bias",
    "diora/root_vector_out_h": "diora.root_vector_out_h",
    "diora/root_mat_out": "diora.root_mat_out",
}


def flatten(params) -> Dict[str, np.ndarray]:
    from cliora_tpu.training.trainer import _local_value

    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = SEP.join(str(getattr(p, "key", p)) for p in path)
        # global (multi-process) arrays are not np-convertible directly;
        # materialize the process-local replica first
        out[key] = np.asarray(_local_value(leaf))
    return out


def unflatten_like(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree shaped like ``template`` from a flat dict.

    Missing keys keep the template's value; extra keys are ignored.
    Returns (pytree, missing_keys, used_keys).
    """
    missing, used = [], []

    def rebuild(path, leaf):
        key = SEP.join(str(getattr(p, "key", p)) for p in path)
        if key in flat:
            used.append(key)
            arr = np.asarray(flat[key])
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            return jnp.asarray(arr, dtype=leaf.dtype)
        missing.append(key)
        return leaf

    tree = jax.tree_util.tree_map_with_path(rebuild, template)
    return tree, missing, used


def save_params(path: str, params, save_embeddings: bool = True,
                extra: Optional[Dict[str, Any]] = None):
    """Native .npz checkpoint (reference: trainer.py:383-398 save_model)."""
    flat = flatten(params)
    if not save_embeddings:
        flat = {k: v for k, v in flat.items() if "embeddings" not in k}
    if extra:
        for k, v in extra.items():
            flat["__extra__" + SEP + k] = np.asarray(v)
    np.savez(path, **flat)


def load_params(path: str, template):
    """Load a native .npz checkpoint into ``template``'s structure."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if not k.startswith("__extra__")}
    params, missing, _ = unflatten_like(template, flat)
    return params, missing


def save_opt_state(path: str, opt_state):
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, opt_state), f)


def load_opt_state(path: str, template):
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    leaves = jax.tree.leaves(loaded)
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])


def _strip_ddp_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def import_torch_checkpoint(path: str, template,
                            load_embeddings: bool = True):
    """Load a reference ``torch.save({'state_dict': ...})`` checkpoint.

    (reference: cliora/net/trainer.py:400-435 ``Trainer.load_model``)
    Returns (params, missing_paths).
    """
    import torch  # cpu-only wheel; host-side deserialization only

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = _strip_ddp_prefix(blob["state_dict"])
    flat = {}
    for our_key, torch_key in _TORCH_NAME.items():
        if torch_key not in state_dict:
            continue
        if not load_embeddings and "embeddings" in our_key:
            continue
        flat[our_key] = state_dict[torch_key].detach().numpy()
    params, missing, _ = unflatten_like(template, flat)
    return params, missing


def export_torch_checkpoint(path: str, params, cfg=None,
                            save_embeddings: bool = True):
    """Write our params as a reference-compatible torch checkpoint.

    ``share=True`` models also emit the aliased ``outside_*`` names, as the
    reference state_dict does for its shared modules.
    """
    import torch

    flat = flatten(params)
    state_dict = {}
    share_alias = {
        "diora/inside_score/mat": "diora.outside_score_func.mat",
        "diora/inside_compose/fc0/w": "diora.outside_compose_func.h_fcs.0.weight",
        "diora/inside_compose/fc0/b": "diora.outside_compose_func.h_fcs.0.bias",
        "diora/inside_compose/fc1/w": "diora.outside_compose_func.h_fcs.2.weight",
        "diora/inside_compose/fc1/b": "diora.outside_compose_func.h_fcs.2.bias",
        "diora/inside_compose/leaf_fc/w": "diora.outside_compose_func.leaf_fc.weight",
        "diora/inside_compose/leaf_fc/b": "diora.outside_compose_func.leaf_fc.bias",
    }
    shared = "diora/outside_score/mat" not in flat
    for our_key, arr in flat.items():
        if not save_embeddings and "embeddings" in our_key:
            continue
        torch_key = _TORCH_NAME.get(our_key)
        if torch_key is None:
            continue
        state_dict[torch_key] = torch.from_numpy(np.asarray(arr).copy())
        if shared and our_key in share_alias:
            state_dict[share_alias[our_key]] = state_dict[torch_key]
    torch.save({"state_dict": state_dict}, path)

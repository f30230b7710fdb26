"""Context-insensitive ELMo character-CNN in JAX.

A from-scratch port of the AllenNLP char encoder the reference vendors
(reference: cliora/external/standalone_elmo.py:244-583): char-id mapping,
char embedding, width-N convolutions + max-pool, highway layers, linear
projection to 512.  Weights load from the standard ELMo hdf5 weight file +
options json.  Only the context-insensitive token embedding is needed
(the reference never runs the biLM either); each vocab word is embedded
independently, so sentence-boundary handling reduces to the special
``<S>``/``</S>`` char sequences.
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

MAX_WORD_LENGTH = 50
BOS_CHAR = 258   # <begin word>... see mapping below
EOW_CHAR = 259
PAD_CHAR = 260
BOS_SENT_CHAR = 256
EOS_SENT_CHAR = 257


def _special_word(first_char: int) -> List[int]:
    ids = [PAD_CHAR] * MAX_WORD_LENGTH
    ids[0] = BOS_CHAR
    ids[1] = first_char
    ids[2] = EOW_CHAR
    return ids


def word_to_char_ids(word: str) -> List[int]:
    """utf-8 bytes framed by begin/end-of-word chars, padded to 50.

    (reference: standalone_elmo.py:285-307; ids are +1-shifted at lookup
    time so 0 is the mask row)
    """
    if word == "<S>":
        return _special_word(BOS_SENT_CHAR)
    if word == "</S>":
        return _special_word(EOS_SENT_CHAR)
    encoded = word.encode("utf-8", "ignore")[: MAX_WORD_LENGTH - 2]
    ids = [PAD_CHAR] * MAX_WORD_LENGTH
    ids[0] = BOS_CHAR
    for i, b in enumerate(encoded):
        ids[i + 1] = b
    ids[len(encoded) + 1] = EOW_CHAR
    return ids


def load_weights(options_path: str, weights_path: str) -> Dict:
    """Read the ELMo hdf5 into a plain pytree.

    Same tensor surgery as the reference loader (transposes, the tf->torch
    highway sign flip, zero row 0 of the char table):
    standalone_elmo.py:495-583.
    """
    import h5py

    with open(options_path) as f:
        options = json.load(f)
    cnn = options["char_cnn"]
    out_dim = options["lstm"]["projection_dim"]

    with h5py.File(weights_path, "r") as f:
        char_embed = f["char_embed"][...]
        table = np.zeros((char_embed.shape[0] + 1, char_embed.shape[1]),
                         np.float32)
        table[1:] = char_embed

        convs = []
        for i, (width, num) in enumerate(cnn["filters"]):
            w = f["CNN"][f"W_cnn_{i}"][...]   # (1, width, embed, num)
            b = f["CNN"][f"b_cnn_{i}"][...]
            convs.append({
                "w": np.asarray(w.squeeze(0), np.float32),  # (width, E, num)
                "b": np.asarray(b, np.float32),
                "width": width,
            })

        highways = []
        for k in range(cnn["n_highway"]):
            g = f[f"CNN_high_{k}"]
            highways.append({
                "w_t": np.asarray(g["W_transform"][...], np.float32),
                "b_t": np.asarray(g["b_transform"][...], np.float32),
                # tf gate convention is flipped vs. the torch port
                "w_c": np.asarray(-g["W_carry"][...], np.float32),
                "b_c": np.asarray(-g["b_carry"][...], np.float32),
            })

        proj = {
            "w": np.asarray(f["CNN_proj"]["W_proj"][...], np.float32),
            "b": np.asarray(f["CNN_proj"]["b_proj"][...], np.float32),
        }

    return {"table": table, "convs": convs, "highways": highways,
            "proj": proj, "activation": cnn["activation"],
            "out_dim": out_dim}


def encode_chars(weights: Dict, char_ids: np.ndarray) -> np.ndarray:
    """(N, 50) raw char ids (pre-shift) -> (N, out_dim) embeddings."""
    import jax
    import jax.numpy as jnp

    act = jnp.tanh if weights["activation"] == "tanh" else jax.nn.relu
    x = jnp.take(jnp.asarray(weights["table"]),
                 jnp.asarray(char_ids) + 1, axis=0)     # (N, 50, E)

    feats = []
    for conv in weights["convs"]:
        w = jnp.asarray(conv["w"])                      # (width, E, num)
        # valid conv over the char axis, then max-pool over positions
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = jnp.max(y + jnp.asarray(conv["b"]), axis=1)  # (N, num)
        feats.append(act(y))
    h = jnp.concatenate(feats, axis=-1)

    for hw in weights["highways"]:
        nonlinear = jax.nn.relu(h @ jnp.asarray(hw["w_t"])
                                + jnp.asarray(hw["b_t"]))
        gate = jax.nn.sigmoid(h @ jnp.asarray(hw["w_c"])
                              + jnp.asarray(hw["b_c"]))
        h = gate * h + (1.0 - gate) * nonlinear

    out = h @ jnp.asarray(weights["proj"]["w"]) + jnp.asarray(
        weights["proj"]["b"])
    return np.asarray(out)


def embed_tokens(tokens: List[str], options_path: str, weights_path: str,
                 batch_size: int = 1024) -> np.ndarray:
    """Embed a token list -> (len(tokens), 512) float32.

    (reference: cliora/data/embeddings.py:46-109 ``ElmoEmbedder.__call__``,
    which embeds each word as its own sentence)
    """
    weights = load_weights(options_path, weights_path)
    out = np.zeros((len(tokens), weights["out_dim"]), np.float32)
    for start in range(0, len(tokens), batch_size):
        chunk = tokens[start:start + batch_size]
        ids = np.asarray([word_to_char_ids(w) for w in chunk], np.int32)
        out[start:start + len(chunk)] = encode_chars(weights, ids)
    return out

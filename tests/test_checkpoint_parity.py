"""Checkpoint shape-map parity vs the reference's committed TF checkpoints
(VERDICT r3 item 2).

The reference ships `tf.train.Checkpoint` `.index` files whose variable
names and shapes ARE readable even though the tensor data blobs are absent
(`checkpoint/ckpt-9` + `checkpoint/pure/epoch-*` = `Transceiver_Star`, the
single-block SE/SD star variant; `checkpoint/FFN/epoch-*` =
`Transceiver_star`, the multi-layer SEncoder/SDecoder variant — SURVEY
§2.34, reference `models/transceiver.py:163-245`). These define the
architectural ground truth: variable inventory and every weight shape.

This test asserts a 1:1 bijection between each reference shape map and the
flax param tree of the corresponding repo model at reference config,
modulo two documented layout differences:

  * MHA q/k/v kernels: reference `[d, d]` (combined heads) <-> repo
    DenseGeneral `[d, heads, d/heads]` (pre-split) — same element count,
    reshape-equivalent.
  * MHA output: reference `dense/kernel [d, d]` <-> repo
    `out/kernel [heads, d/heads, d]`.

It fails if any variable is missing, extra, or shape-mismatched — i.e. if
the rebuild's width, depth, head count, vocab, or quirk handling (identity
FFN = NO FFN weights; STE's single shared LayerNorm; multi-layer star's
relay-weight reuse = NO relay weights) silently diverges from the
reference architecture.
"""

import os

import pytest

REF_CKPT = "/root/reference/DeepSC-GAN/checkpoint"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CKPT), reason="reference checkpoints not available")

tf = pytest.importorskip("tensorflow")


def _ref_shape_map(path):
    reader = tf.train.load_checkpoint(path)
    m = reader.get_variable_to_shape_map()
    out = {}
    for k, shape in m.items():
        if not k.endswith("/.ATTRIBUTES/VARIABLE_VALUE"):
            continue  # save_counter etc.
        name = k[: -len("/.ATTRIBUTES/VARIABLE_VALUE")]
        if "/" not in name:
            continue  # save_counter
        root, rest = name.split("/", 1)
        assert root in ("Transceiver_Star", "Transceiver_star"), name
        out[rest] = tuple(shape)
    return out


def _translate(ref_name: str) -> str:
    """Reference TF variable path -> repo flax param path."""
    parts = ref_name.split("/")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "embedding" and parts[i + 1] == "embeddings":
            out += ["embed", "embedding", "embedding"]
            i += 2
            continue
        if p in ("encoder", "dec_layers"):
            # multi-layer stacks index their layers; single blocks don't
            if i + 1 < len(parts) and parts[i + 1].isdigit():
                out.append(f"layer{parts[i + 1]}")
                i += 2
            else:
                out.append("block")
                i += 1
            continue
        if p == "multi_att_satellite":
            out.append("att_satellite")
        elif p == "multi_att_relay":
            out.append("att_relay")
        elif p == "dense" and out and out[-1] in ("att_satellite",
                                                  "att_relay", "multi_tar"):
            out.append("out")
        elif p == "beta":
            out.append("bias")
        elif p == "gamma":
            out.append("scale")
        else:
            out.append(p)
        i += 1
    return "/".join(out)


def _repo_tree(variant):
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from deepsc_gan_tpu.models.transceiver import make_model
    from deepsc_gan_tpu.ops.masks import create_masks
    from deepsc_gan_tpu.utils.config import Config

    cfg = Config(ffn_mode="identity")  # quirk Q1: reference FFN has no vars
    inp = jnp.zeros((2, 31), jnp.int32)
    epm, cm, dpm = create_masks(inp, inp)
    model = make_model(cfg, variant)
    v = model.init(jax.random.PRNGKey(0), inp, inp, jax.random.PRNGKey(1),
                   jnp.zeros((2, 31, 16)), 0.0, "AWGN", 0.1, epm, cm, dpm)
    return {k: tuple(x.shape) for k, x in
            flatten_dict(v["params"], sep="/").items()}


def _shapes_equivalent(ref_shape, repo_shape):
    if ref_shape == repo_shape:
        return True
    # documented MHA layout transposes: [d,d] <-> [d,h,dh] or [h,dh,d]
    import numpy as np
    return (np.prod(ref_shape) == np.prod(repo_shape)
            and len(ref_shape) == 2 and len(repo_shape) == 3)


@pytest.mark.parametrize("ckpt,variant", [
    ("ckpt-9", "star"),
    ("pure/epoch-20", "star"),
    ("pure/epoch-10", "star"),
    ("FFN/epoch-20", "star_multi"),
    ("FFN/epoch-10", "star_multi"),
])
def test_shape_map_bijection(ckpt, variant):
    ref = _ref_shape_map(os.path.join(REF_CKPT, ckpt))
    repo = _repo_tree(variant)

    translated = {_translate(k): v for k, v in ref.items()}
    assert len(translated) == len(ref), "translation collided two names"

    missing = sorted(set(translated) - set(repo))
    extra = sorted(set(repo) - set(translated))
    assert not missing, f"reference vars absent from repo tree: {missing}"
    assert not extra, f"repo vars absent from reference ckpt: {extra}"

    for name, ref_shape in sorted(translated.items()):
        assert _shapes_equivalent(ref_shape, repo[name]), (
            f"{name}: reference {ref_shape} vs repo {repo[name]}")


def test_reference_quirks_visible_in_shape_maps():
    """The shape maps themselves pin three reference quirks."""
    single = _ref_shape_map(os.path.join(REF_CKPT, "ckpt-9"))
    multi = _ref_shape_map(os.path.join(REF_CKPT, "FFN/epoch-20"))

    # Q1: no FFN weights anywhere (sublayer2 is an identity layer) — even
    # in the checkpoint dir literally named "FFN"
    assert not any("ffn" in k.lower() or "fc" in k for k in single)
    assert not any("ffn" in k.lower() or "fc" in k for k in multi)

    # STE/STD (single block) use a separate relay attention head...
    assert any("multi_att_relay" in k for k in single)
    # ...but the multi-layer stacks reuse the satellite head for the relay
    # (reference modules.py:175 vs :305)
    assert not any("multi_att_relay" in k for k in multi)

    # STE shares one LayerNorm (layernorm1) for both residual sites
    enc_lns = {k for k in single
               if k.startswith("semantic_encoder/encoder/layernorm")}
    assert enc_lns == {"semantic_encoder/encoder/layernorm1/beta",
                       "semantic_encoder/encoder/layernorm1/gamma"}

    # variable counts: 49 (single) / 108 (multi)
    assert len(single) == 49
    assert len(multi) == 108

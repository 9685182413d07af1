"""CLIP visual tower: converter + attention parity vs torch's
multi_head_attention_forward (the exact function OpenAI CLIP's blocks
call), with synthetic weights."""
import numpy as np
import jax.numpy as jnp
import pytest

from f3d_gaus_tpu.models import clip

torch = pytest.importorskip("torch")


def _synth_state_dict(seed=0, grid=2):
    torch.manual_seed(seed)
    W, L = clip.WIDTH, clip.LAYERS
    sd = {
        "visual.conv1.weight": torch.randn(W, 3, 32, 32) * 0.02,
        "visual.class_embedding": torch.randn(W) * 0.02,
        "visual.positional_embedding": torch.randn(grid * grid + 1, W) * 0.02,
        "visual.ln_pre.weight": torch.ones(W),
        "visual.ln_pre.bias": torch.zeros(W),
        "visual.ln_post.weight": torch.ones(W),
        "visual.ln_post.bias": torch.zeros(W),
        "visual.proj": torch.randn(W, clip.EMBED) * 0.02,
    }
    for i in range(L):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = torch.ones(W)
        sd[f"{p}.ln_1.bias"] = torch.zeros(W)
        sd[f"{p}.attn.in_proj_weight"] = torch.randn(3 * W, W) * 0.02
        sd[f"{p}.attn.in_proj_bias"] = torch.randn(3 * W) * 0.01
        sd[f"{p}.attn.out_proj.weight"] = torch.randn(W, W) * 0.02
        sd[f"{p}.attn.out_proj.bias"] = torch.randn(W) * 0.01
        sd[f"{p}.ln_2.weight"] = torch.ones(W)
        sd[f"{p}.ln_2.bias"] = torch.zeros(W)
        sd[f"{p}.mlp.c_fc.weight"] = torch.randn(4 * W, W) * 0.02
        sd[f"{p}.mlp.c_fc.bias"] = torch.randn(4 * W) * 0.01
        sd[f"{p}.mlp.c_proj.weight"] = torch.randn(W, 4 * W) * 0.02
        sd[f"{p}.mlp.c_proj.bias"] = torch.randn(W) * 0.01
    return sd


def test_mha_matches_torch():
    sd = _synth_state_dict()
    params = clip.convert_torch_clip_visual(sd)
    blk = params["blocks"][0]["attn"]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, clip.WIDTH)).astype(np.float32)
    got = np.asarray(clip._mha(jnp.asarray(x), blk, clip.HEADS))
    with torch.no_grad():
        t = torch.from_numpy(x).transpose(0, 1)   # (L, N, W)
        out, _ = torch.nn.functional.multi_head_attention_forward(
            t, t, t, clip.WIDTH, clip.HEADS,
            sd["visual.transformer.resblocks.0.attn.in_proj_weight"],
            sd["visual.transformer.resblocks.0.attn.in_proj_bias"],
            None, None, False, 0.0,
            sd["visual.transformer.resblocks.0.attn.out_proj.weight"],
            sd["visual.transformer.resblocks.0.attn.out_proj.bias"],
            need_weights=False)
        want = out.transpose(0, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_block_matches_torch_residual_attention_block():
    """Full pre-norm block vs a torch replica of OpenAI CLIP's
    ResidualAttentionBlock — pins QuickGELU (x*sigmoid(1.702x)), not exact
    GELU, as the MLP activation the converted weights assume."""
    sd = _synth_state_dict()
    params = clip.convert_torch_clip_visual(sd)
    blk = params["blocks"][0]
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, clip.WIDTH)).astype(np.float32)
    got = np.asarray(clip._block(jnp.asarray(x), blk, clip.HEADS))
    p = "visual.transformer.resblocks.0"
    with torch.no_grad():
        t = torch.from_numpy(x)
        ln1 = torch.nn.functional.layer_norm(
            t, (clip.WIDTH,), sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"])
        a, _ = torch.nn.functional.multi_head_attention_forward(
            ln1.transpose(0, 1), ln1.transpose(0, 1), ln1.transpose(0, 1),
            clip.WIDTH, clip.HEADS,
            sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[f"{p}.attn.out_proj.weight"], sd[f"{p}.attn.out_proj.bias"],
            need_weights=False)
        t = t + a.transpose(0, 1)
        h = torch.nn.functional.layer_norm(
            t, (clip.WIDTH,), sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
        h = torch.nn.functional.linear(
            h, sd[f"{p}.mlp.c_fc.weight"], sd[f"{p}.mlp.c_fc.bias"])
        h = h * torch.sigmoid(1.702 * h)          # QuickGELU
        h = torch.nn.functional.linear(
            h, sd[f"{p}.mlp.c_proj.weight"], sd[f"{p}.mlp.c_proj.bias"])
        want = (t + h).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encode_and_loss_shapes():
    sd = _synth_state_dict(grid=2)
    params = clip.convert_torch_clip_visual(sd)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32))
    e = clip.encode_image(params, x)
    assert e.shape == (2, clip.EMBED)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1),
                               1.0, rtol=1e-5)
    # identical inputs -> zero loss; different -> positive
    loss_same = float(clip.clip_loss(params, x, x, resize_to=64))
    assert abs(loss_same) < 1e-5
    y = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32))
    assert float(clip.clip_loss(params, x, y, resize_to=64)) > 0

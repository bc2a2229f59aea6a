"""Cross-framework architecture parity using locally-installed torch libs.

No SD weights exist in this environment, but transformers (CLIPTextModel)
and torch ops are installed — random-weight parity checks validate our
architectures and converters exactly (SURVEY.md §4 recommendation (a)).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')


def test_clip_text_matches_transformers():
    """Random-init transformers CLIPTextModel == our functional CLIP after
    state-dict conversion (last_hidden_state, fp32)."""
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=1000, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=2, max_position_embeddings=77,
                      hidden_act='quick_gelu')
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()

    ids = np.array([[49406 % 1000, 5, 7, 300, 999] + [999] * 72,
                    [1, 2, 3, 4, 5] + [999] * 72], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()

    from mixofshow_tpu.convert import convert_clip_text
    from mixofshow_tpu.models.clip import CLIPTextConfig, clip_text_encode
    import jax.numpy as jnp

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    ours_cfg = CLIPTextConfig(vocab_size=1000, width=64, layers=2, heads=2,
                              mlp_dim=128)
    params = convert_clip_text(sd, ours_cfg)
    out = np.asarray(clip_text_encode(params, jnp.asarray(ids), ours_cfg))

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_conv_padding_semantics_match_torch():
    """SAME 3x3 conv, stride-2 VALID with (0,1,0,1) pad (VAE downsample),
    and stride-2 with pad 1 (UNet downsample) all match torch."""
    import jax.numpy as jnp
    from mixofshow_tpu.models.layers import conv2d

    r = np.random.default_rng(0)
    x = r.normal(size=(1, 9, 9, 6)).astype(np.float32)   # odd spatial
    w = r.normal(size=(3, 3, 6, 4)).astype(np.float32)   # HWIO
    b = r.normal(size=(4,)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))       # OIHW
    bt = torch.from_numpy(b)
    p = {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)}

    # SAME, stride 1 (torch padding=1)
    ours = np.asarray(conv2d(p, jnp.asarray(x)))
    ref = torch.nn.functional.conv2d(xt, wt, bt, padding=1).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)

    # VAE downsample: explicit (0,1,0,1) pad + stride-2 VALID
    xp = jnp.pad(jnp.asarray(x), [(0, 0), (0, 1), (0, 1), (0, 0)])
    ours = np.asarray(conv2d(p, xp, stride=2, padding='VALID'))
    xt_p = torch.nn.functional.pad(xt, (0, 1, 0, 1))
    ref = torch.nn.functional.conv2d(xt_p, wt, bt, stride=2).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)

    # UNet downsample: pad 1 both sides + stride 2
    x16 = jnp.asarray(r.normal(size=(1, 16, 16, 6)).astype(np.float32))
    xp = jnp.pad(x16, [(0, 0), (1, 1), (1, 1), (0, 0)])
    ours = np.asarray(conv2d(p, xp, stride=2, padding='VALID'))
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(np.asarray(x16).transpose(0, 3, 1, 2)), wt, bt,
        stride=2, padding=1).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)


def test_group_norm_matches_torch():
    import jax.numpy as jnp
    from mixofshow_tpu.models.layers import group_norm

    r = np.random.default_rng(1)
    x = r.normal(size=(2, 8, 8, 32)).astype(np.float32)
    scale = r.normal(size=(32,)).astype(np.float32)
    bias = r.normal(size=(32,)).astype(np.float32)
    ours = np.asarray(group_norm({'scale': jnp.asarray(scale),
                                  'bias': jnp.asarray(bias)},
                                 jnp.asarray(x), num_groups=8, eps=1e-6))
    gn = torch.nn.GroupNorm(8, 32, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-4)


def test_timestep_embedding_matches_diffusers_formula():
    """Independent reimplementation of the SD sinusoidal embedding (half cos
    then sin after flip, freq = exp(-ln(1e4)*i/half)) in torch."""
    from mixofshow_tpu.models.layers import timestep_embedding
    import jax.numpy as jnp

    t = np.array([0, 1, 500, 999], np.int32)
    dim = 320
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0) *
                      torch.arange(half, dtype=torch.float32) / half)
    args = torch.from_numpy(t.astype(np.float32))[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(ours, ref, atol=1e-4)  # fp32 trig rounding

"""Prompt-to-prompt controller + sequence-aligner tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.models.sd.seq_aligner import (
    get_mapper,
    get_replacement_mapper_,
    get_word_inds,
)
from voxe_tpu.models.sd.tokenizer import HashTokenizer


@pytest.fixture
def tokenizer():
    return HashTokenizer()


def test_word_inds_single_token_words(tokenizer):
    inds = get_word_inds("a red dog", 1, tokenizer)
    np.testing.assert_array_equal(inds, [2])  # BOS at 0


def test_replacement_mapper_swaps_changed_word(tokenizer):
    mapper = get_replacement_mapper_("a red dog", "a blue dog", tokenizer)
    assert mapper.shape == (77, 77)
    # unchanged positions map identity
    assert mapper[1, 1] == 1.0 and mapper[3, 3] == 1.0
    # changed word position maps source->target
    assert mapper[2, 2] == 1.0
    # each row sums to ~1 within prompt region
    np.testing.assert_allclose(mapper[:5].sum(axis=1), 1.0)


def test_replacement_mapper_rejects_length_mismatch(tokenizer):
    with pytest.raises(ValueError):
        get_replacement_mapper_("a dog", "a big dog", tokenizer)


def test_refinement_mapper_alignment(tokenizer):
    """The mapper lives in WITH-SPECIALS coordinates (77-token attention
    layout: 0=BOS, then content, then EOS) — one token per word under the
    hash tokenizer, so 'a fluffy dog' is [BOS, a, fluffy, dog, EOS]."""
    mapper, alphas = get_mapper("a dog", "a fluffy dog", tokenizer)
    assert mapper.shape == (77,) and alphas.shape == (77,)
    # BOS inherits BOS, 'a' inherits 'a'
    assert mapper[0] == 0 and alphas[0] == 1.0
    assert mapper[1] == 1 and alphas[1] == 1.0
    # 'fluffy' is NEW material: keeps its own attention (alpha 0)
    assert alphas[2] == 0.0
    # 'dog' (y pos 3) inherits x's 'dog' (x pos 2), NOT x's EOS
    assert mapper[3] == 2 and alphas[3] == 1.0
    # EOS aligns to EOS
    assert mapper[4] == 3 and alphas[4] == 1.0
    # beyond the prompt: identity
    assert mapper[10] == 10


def test_attention_reweight_scales_tokens(tokenizer):
    from voxe_tpu.models.sd.controllers import AttentionReweight, get_equalizer

    equalizer = get_equalizer("a red dog", "red", (3.0,), tokenizer)
    ctrl = AttentionReweight(
        ["a red dog"], tokenizer, num_steps=10, equalizer=equalizer
    )
    attn = jnp.ones((2, 4, 16, 77))  # [batch=src+1tgt, heads, Q, K]
    out = ctrl(attn, "down")
    assert out.shape == attn.shape
    # source row untouched; target row scaled at the "red" token index
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)
    red_idx = int(get_word_inds("a red dog", "red", tokenizer)[0])
    assert float(out[1, 0, 0, red_idx]) == pytest.approx(3.0)
    assert float(out[1, 0, 0, 0]) == pytest.approx(1.0)


def test_local_blend_masks_latents(tokenizer):
    from voxe_tpu.models.sd.controllers import LocalBlend

    lb = LocalBlend(["a red dog", "a red cat"], ["dog", "cat"], tokenizer)
    latents = jnp.stack([jnp.zeros((32, 32, 4)), jnp.ones((32, 32, 4))])
    attn16 = jnp.zeros((2, 16, 16, 77)).at[:, 4:8, 4:8, 3].set(1.0)
    out = lb(latents, attn16)
    arr = np.asarray(out)
    # outside the mask the target equals the source (zeros)
    assert arr[1, 0, 0].max() == 0.0
    # inside the mask the target keeps its own value (ones)
    assert arr[1, 12, 12].max() == 1.0


def test_attention_replace_controller(tokenizer):
    import jax.numpy as jnp

    from voxe_tpu.models.sd.controllers import AttentionReplace

    ctrl = AttentionReplace(["a red dog", "a blue dog"], tokenizer, num_steps=10)
    # cross-attention input [src+1tgt, heads, Q, K=77]
    attn = jnp.zeros((2, 2, 4, 77)).at[0, :, :, 2].set(1.0)  # source attends token 2
    out = ctrl(attn, "down")
    # target row now carries the source's attention mapped to target tokens
    assert float(out[1, 0, 0, 2]) == 1.0
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(attn[0]))


def test_attention_refine_controller(tokenizer):
    import jax.numpy as jnp

    from voxe_tpu.models.sd.controllers import AttentionRefine

    ctrl = AttentionRefine(["a dog", "a fluffy dog"], tokenizer, num_steps=10)
    attn = jnp.zeros((2, 2, 4, 77)).at[0, :, :, 1].set(1.0)
    out = ctrl(attn, "down")
    assert out.shape == attn.shape
    assert np.isfinite(np.asarray(out)).all()
    # aligned positions take the source's attention (alpha=1 there)
    assert float(np.abs(np.asarray(out[1])).sum()) > 0.0


def test_self_attention_swap_in_edit_window(tokenizer):
    import jax.numpy as jnp

    from voxe_tpu.models.sd.controllers import AttentionReplace

    ctrl = AttentionReplace(["a red dog", "a blue dog"], tokenizer, num_steps=10)
    self_attn = jnp.zeros((2, 2, 16, 16)).at[0].set(0.7).at[1].set(0.1)
    out = ctrl(self_attn, "down")  # K != 77 -> self-attention branch
    # within the self-replace window the target row copies the source
    np.testing.assert_allclose(np.asarray(out[1]), 0.7)

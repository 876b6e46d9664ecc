"""Prompt-to-prompt attention controllers.

Rebuild of reference: thre3d_atom/thre3d_reprs/cross_attn.py:204-422
(AttentionStore / AttentionReplace / AttentionRefine / AttentionReweight /
LocalBlend). The Vox-E pipeline itself only uses AttentionStore-style capture
(which in this framework is the functional `sow` path inside the UNet,
unet.py); the edit controllers are provided for completeness as pure
attention-map transforms: `controller(attn [B, Q, K], place)` returns the
edited maps. They can be applied to captured maps or plugged into a custom
UNet call.
"""
from __future__ import annotations

import abc
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from voxe_tpu.models.sd.seq_aligner import (
    get_refinement_mapper,
    get_replacement_mapper,
    get_word_inds,
)


class AttentionControl(abc.ABC):
    def __init__(self):
        self.cur_step = 0

    def step(self):
        self.cur_step += 1

    @abc.abstractmethod
    def __call__(self, attn: jnp.ndarray, place: str) -> jnp.ndarray: ...


class AttentionStore(AttentionControl):
    """Accumulates maps per place; mirror of the reference store
    (cross_attn.py:167-202). In the functional pipeline this is normally
    unnecessary (maps arrive via the `attn_maps` sow collection), but the
    class keeps the familiar interface for porting code."""

    MAX_RESOLUTION_SQ = 32**2

    def __init__(self):
        super().__init__()
        self.step_store: Dict[str, List[jnp.ndarray]] = self._empty()
        self.attention_store: Dict[str, List[jnp.ndarray]] = {}

    @staticmethod
    def _empty():
        return {
            f"{p}_{t}": [] for p in ("down", "mid", "up") for t in ("cross", "self")
        }

    def __call__(self, attn: jnp.ndarray, place: str) -> jnp.ndarray:
        if attn.shape[-2] <= self.MAX_RESOLUTION_SQ:
            self.step_store[place].append(attn)
        return attn

    def between_steps(self):
        if not self.attention_store:
            self.attention_store = self.step_store
        else:
            for key in self.attention_store:
                for i in range(len(self.attention_store[key])):
                    self.attention_store[key][i] = (
                        self.attention_store[key][i] + self.step_store[key][i]
                    )
        self.step_store = self._empty()
        self.step()

    def get_average_attention(self):
        steps = max(self.cur_step, 1)
        return {
            key: [item / steps for item in maps]
            for key, maps in self.attention_store.items()
        }


class AttentionControlEdit(AttentionControl, abc.ABC):
    """Base for edits swapping target-prompt attention toward the source's
    (cross_attn.py:204-280). `self_replace_steps`/`cross_replace_steps` are
    fractions of total steps during which the swap is active."""

    def __init__(
        self,
        num_steps: int,
        cross_replace_steps: float = 1.0,
        self_replace_steps: float = 1.0,
    ):
        super().__init__()
        self.num_steps = num_steps
        self.cross_replace_range = int(num_steps * cross_replace_steps)
        self.self_replace_range = int(num_steps * self_replace_steps)

    @abc.abstractmethod
    def replace_cross_attention(self, attn_base, attn_replace): ...

    def __call__(self, attn: jnp.ndarray, place: str) -> jnp.ndarray:
        """attn: [batch(1 + n_targets), heads, Q, K]; row 0 is the source."""
        is_cross = attn.shape[-1] == 77
        attn_base, attn_target = attn[:1], attn[1:]
        if is_cross and self.cur_step < self.cross_replace_range:
            attn_target = self.replace_cross_attention(attn_base, attn_target)
        elif not is_cross and self.cur_step < self.self_replace_range:
            attn_target = jnp.broadcast_to(attn_base, attn_target.shape)
        return jnp.concatenate([attn_base, attn_target], axis=0)


class AttentionReplace(AttentionControlEdit):
    """Word-for-word replacement via the token permutation mapper
    (cross_attn.py:282-300)."""

    def __init__(self, prompts, tokenizer, num_steps, **kwargs):
        super().__init__(num_steps, **kwargs)
        self.mapper = jnp.asarray(get_replacement_mapper(prompts, tokenizer))

    def replace_cross_attention(self, attn_base, attn_replace):
        return jnp.einsum("bhqk,bkl->bhql", attn_base.repeat(len(self.mapper), 0), self.mapper)


class AttentionRefine(AttentionControlEdit):
    """Prompt refinement via alignment mapper + alphas (cross_attn.py:302-324)."""

    def __init__(self, prompts, tokenizer, num_steps, **kwargs):
        super().__init__(num_steps, **kwargs)
        mapper, alphas = get_refinement_mapper(prompts, tokenizer)
        self.mapper = jnp.asarray(mapper)
        self.alphas = jnp.asarray(alphas)[:, None, None, :]

    def replace_cross_attention(self, attn_base, attn_replace):
        # attn_base [1, h, Q, K]; attn_replace [T, h, Q, K]: per target,
        # gather the source's attention at the mapped token positions and
        # blend by the alignment alphas (reference cross_attn.py:302-324)
        gathered = jnp.stack(
            [jnp.take(attn_base[0], m, axis=-1) for m in self.mapper]
        )  # [T, h, Q, K]
        return gathered * self.alphas + attn_replace * (1 - self.alphas)


class AttentionReweight(AttentionControlEdit):
    """Scale attention of selected tokens (cross_attn.py:326-352)."""

    def __init__(
        self,
        prompts,
        tokenizer,
        num_steps,
        equalizer: jnp.ndarray,
        prev_controller: Optional[AttentionControlEdit] = None,
        **kwargs,
    ):
        super().__init__(num_steps, **kwargs)
        self.equalizer = equalizer[:, None, None, :]
        self.prev_controller = prev_controller

    def replace_cross_attention(self, attn_base, attn_replace):
        if self.prev_controller is not None:
            attn_replace = self.prev_controller.replace_cross_attention(
                attn_base, attn_replace
            )
        return attn_replace * self.equalizer


def get_equalizer(
    text: str, word_select, values: Tuple[float, ...], tokenizer
) -> jnp.ndarray:
    """Equalizer vector for AttentionReweight (cross_attn.py:355-367)."""
    if isinstance(word_select, (int, str)):
        word_select = (word_select,)
    equalizer = np.ones((len(values), 77), dtype=np.float32)
    for word, value in zip(word_select, values):
        inds = get_word_inds(text, word, tokenizer)
        equalizer[:, inds] = value
    return jnp.asarray(equalizer)


class LocalBlend:
    """Blend edited/unedited latents inside a word-attention mask
    (cross_attn.py:369-422). Call with latents [B, h, w, 4] and the averaged
    16x16 cross maps [B, 16, 16, 77]."""

    def __init__(self, prompts, words, tokenizer, threshold: float = 0.3):
        alpha_layers = np.zeros((len(prompts), 77), dtype=np.float32)
        for i, (prompt, words_) in enumerate(zip(prompts, words)):
            if isinstance(words_, str):
                words_ = [words_]
            for word in words_:
                inds = get_word_inds(prompt, word, tokenizer)
                alpha_layers[i, inds] = 1.0
        self.alpha_layers = jnp.asarray(alpha_layers)[:, None, None, :]
        self.threshold = threshold

    def __call__(self, latents: jnp.ndarray, attn_maps_16: jnp.ndarray) -> jnp.ndarray:
        import jax

        maps = attn_maps_16 * self.alpha_layers  # [B, 16, 16, 77]
        mask_small = maps.sum(-1)  # [B, 16, 16]
        mask = jax.image.resize(
            mask_small, (latents.shape[0], *latents.shape[1:3]), method="bilinear"
        )
        mask = mask / (mask.max(axis=(1, 2), keepdims=True) + 1e-8)
        mask = (mask >= self.threshold).astype(latents.dtype)[..., None]
        return latents[:1] + mask * (latents - latents[:1])

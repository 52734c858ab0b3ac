"""High-level generation pipeline: prompts in, images out.

The reference has no such API — users assemble sampling from the notebook
(readme.md:39-41: text-to-image, inpainting, outpainting, latent interpolation,
structural editing, multi-modal conditioning). PaellaPipeline packages those
capabilities over the framework's jit'd sampler and codec.

Conditioning encoders are pluggable: pass jit-able callables (e.g. the native
T5Encoder / CLIP towers bound to converted weights) or precomputed embeddings.
Text is padded to bucket sizes so repeated prompts of similar length reuse the
same compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from collections import OrderedDict

from .codec.vqgan import VQModel
from .config import SampleConfig
from .cond.tokenizers import byt5_batch_encode, pad_bucket
from .models.denoiser import Paella
from .sampling.sampler import Conditioning, interpolate_latents, outpaint_canvas, sample

Array = jax.Array


@dataclasses.dataclass
class PaellaPipeline:
    """Bundles denoiser + codec + frozen conditioning encoders.

    byt5_encode_fn: (ids (B,S) int32, mask (B,S) bool) -> (B,S,byt5_embd) states
    clip_text_fn:   (prompts list[str]) -> (B, clip_embd) or None
    clip_image_fn:  (images (B,H,W,3) in [0,1]) -> (B, clip_embd) or None
    """

    model: Paella
    params: Any
    vq: VQModel
    vq_vars: Any
    byt5_encode_fn: Callable[[Array, Array], Array]
    clip_text_fn: Optional[Callable[[Sequence[str]], Array]] = None
    clip_image_fn: Optional[Callable[[Array], Array]] = None
    byt5_max_length: int = 768
    # text-conditioning LRU: serving workloads re-generate the SAME prompt
    # with different seeds/cfg; the frozen encoders make the states
    # deterministic, so a hit skips the whole ByT5 tower (~40-50 ms/request
    # at XL). Entries are on-device (~330 KB/prompt at d=2560, 64-byte
    # bucket => the 128-entry default is ~42 MB HBM). 0 disables.
    text_cache_size: int = 128
    _text_cache: OrderedDict = dataclasses.field(
        default_factory=OrderedDict, init=False, repr=False
    )
    # jitted codec entry points, built lazily (NEVER run the codec eagerly:
    # on a remote/tunneled TPU every eager op is a dispatch round trip —
    # measured >1 s/request through the HTTP server before these were jitted)
    _jit_cache: dict = dataclasses.field(default_factory=dict, init=False, repr=False)

    # -- layout ------------------------------------------------------------

    def optimize_layout(self) -> "PaellaPipeline":
        """Return a pipeline with the even/odd-split skip-level layout applied
        (models/layout.py): a BIT-EXACT weight permutation measured faster on
        v5e (flagship forward 11.41 -> 11.19 ms p50; kills the up-path skip
        deinterleave copies). This wrapper keeps the config flag and the
        transformed params in sync atomically — setting `split_skip_levels`
        with untransformed params produces silent garbage. No-op when no
        level is fuse-eligible (e.g. tiny geometries), when the layout is
        already applied, or when `fused_blocks` is off (the split path
        requires the fused kernels).

        CAVEAT: the split path REQUIRES the fused kernel at request time, and
        the runtime fuse gate also depends on the latent H*W and batch
        (kernels/resblock.py::fuse_mode VMEM budget). Level eligibility here
        is alignment-only, checked at the flagship 256^2 geometry — an
        optimized pipeline serving much larger canvases (e.g. 512^2) can fail
        the gate at generation time and raise, where the unoptimized pipeline
        would fall back to the XLA path. Apply it for fixed-size 256^2-class
        serving; keep the base pipeline for arbitrary-size workloads."""
        from .models.layout import default_split_levels, split_skip_params

        cfg = self.model.config
        levels = default_split_levels(cfg)
        if not levels or cfg.split_skip_levels or not cfg.fused_blocks:
            return self
        new_cfg = dataclasses.replace(cfg, split_skip_levels=levels)
        params = jax.jit(lambda p: split_skip_params(p, cfg, levels))(self.params)
        new = dataclasses.replace(self, model=Paella(new_cfg), params=params)
        # the codec and conditioning caches depend only on vq/vq_vars and the
        # frozen encoders, which are unchanged — carry the warm jits over
        new._jit_cache.update(self._jit_cache)
        new._text_cache.update(self._text_cache)
        return new

    # -- conditioning ------------------------------------------------------

    def encode_text(self, prompts: Sequence[str]) -> tuple[Array, Array]:
        key = (tuple(prompts), self.byt5_max_length)
        hit = self._text_cache.get(key)
        if hit is not None:
            self._text_cache.move_to_end(key)
            return hit
        ids, mask = byt5_batch_encode(prompts, max_length=self.byt5_max_length)
        target = pad_bucket(ids.shape[1])
        if target > ids.shape[1]:
            pad = target - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        out = (
            self.byt5_encode_fn(jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask),
        )
        if self.text_cache_size > 0:
            self._text_cache[key] = out
            while len(self._text_cache) > self.text_cache_size:
                self._text_cache.popitem(last=False)
        return out

    def conditioning(
        self,
        prompts: Sequence[str],
        images: Optional[Array] = None,
    ) -> Conditioning:
        # text-only conditioning is deterministic in the prompts — LRU the
        # whole bundle (ByT5 AND CLIP-text towers) for seed sweeps / repeated
        # negative prompts; image conditioning can't be keyed (array input)
        # but its byt5 part still hits the encode_text cache
        key = ("cond", tuple(prompts))
        if images is None:
            hit = self._text_cache.get(key)
            if hit is not None:
                self._text_cache.move_to_end(key)
                return hit
        byt5, byt5_mask = self.encode_text(prompts)
        clip = self.clip_text_fn(prompts) if self.clip_text_fn is not None else None
        clip_image = (
            self.clip_image_fn(images) if (self.clip_image_fn is not None and images is not None) else None
        )
        out = Conditioning(byt5=byt5, byt5_mask=byt5_mask, clip=clip, clip_image=clip_image)
        if images is None and self.text_cache_size > 0:
            self._text_cache[key] = out
            while len(self._text_cache) > self.text_cache_size:
                self._text_cache.popitem(last=False)
        return out

    def null_conditioning(self, batch: int) -> Conditioning:
        # deterministic given the frozen encoders — cache per batch size so a
        # serving loop doesn't re-encode the empty prompt every request
        key = ("null_cond", batch)
        if key not in self._jit_cache:
            self._jit_cache[key] = self.conditioning([""] * batch)
        return self._jit_cache[key]

    # -- generation --------------------------------------------------------

    def _latent_hw(self, image_hw: tuple[int, int]) -> tuple[int, int]:
        f = self.vq.config.downscale
        return image_hw[0] // f, image_hw[1] // f

    def decode(self, tokens: Array) -> Array:
        if "decode" not in self._jit_cache:
            vq = self.vq
            self._jit_cache["decode"] = jax.jit(
                lambda v, t: vq.apply(v, t, method=VQModel.decode_indices)
            )
        return self._jit_cache["decode"](self.vq_vars, tokens)

    def _decode_clipped(self, tokens: Array) -> Array:
        """decode + clip-to-[0,1] as ONE program (the generation paths'
        deliverable); keeps the eager clip dispatch off the request path."""
        if "decode_clipped" not in self._jit_cache:
            vq = self.vq
            self._jit_cache["decode_clipped"] = jax.jit(
                lambda v, t: jnp.clip(
                    vq.apply(v, t, method=VQModel.decode_indices), 0.0, 1.0
                )
            )
        return self._jit_cache["decode_clipped"](self.vq_vars, tokens)

    def encode_image_tokens(self, images: Array) -> Array:
        """Image -> token grid via the frozen codec encoder."""
        if "encode" not in self._jit_cache:
            vq = self.vq
            self._jit_cache["encode"] = jax.jit(
                lambda v, x: vq.apply(v, x, method=VQModel.encode)[2]
            )
        return self._jit_cache["encode"](self.vq_vars, images)

    def text_to_image(
        self,
        prompts: Sequence[str],
        key: Array,
        image_hw: tuple[int, int] = (256, 256),
        config: SampleConfig = SampleConfig(),
        images_for_clip: Optional[Array] = None,
        cond_reweight: Optional[Array] = None,
        negative_prompts: Optional[Sequence[str]] = None,
    ) -> Array:
        """Full text-to-image: returns (B, H, W, 3) in [0, 1] (clipped).

        negative_prompts: CFG steers away from these instead of the empty prompt
        (the unconditional branch IS the negative direction in the reference's
        guidance mix, src_distributed/utils.py:117)."""
        b = len(prompts)
        cond = self.conditioning(prompts, images_for_clip)
        uncond = (
            self.conditioning(list(negative_prompts))
            if negative_prompts is not None
            else self.null_conditioning(b)
        )
        h, w = self._latent_hw(image_hw)
        tokens = sample(
            self.model,
            self.params,
            key,
            cond,
            (b, h, w),
            uncond,
            config,
            cond_reweight=cond_reweight,
        )
        return self._decode_clipped(tokens)

    def text_to_image_best_of(
        self,
        prompts: Sequence[str],
        key: Array,
        n: int,
        image_hw: tuple[int, int] = (256, 256),
        config: SampleConfig = SampleConfig(),
        return_scores: bool = False,
        **kwargs,
    ):
        """Best-of-N generation with CLIP rerank: sample n candidates per
        prompt in ONE batched call, score each with eval.clip_score using the
        pipeline's CLIP towers, return the best image per prompt.

        Requires clip_text_fn and clip_image_fn. Beyond the reference's
        notebook surface; uses the eval/ metrics the reference lacks.
        """
        if self.clip_text_fn is None or self.clip_image_fn is None:
            raise ValueError("best-of-N rerank needs clip_text_fn and clip_image_fn")
        from .eval import clip_score

        b = len(prompts)
        rep = [p for p in prompts for _ in range(n)]
        images = self.text_to_image(rep, key, image_hw, config, **kwargs)
        t = self.clip_text_fn(rep)
        v = self.clip_image_fn(images)
        scores = clip_score(t, v).reshape(b, n)
        best = jnp.argmax(scores, axis=1)
        images = images.reshape(b, n, *images.shape[1:])[jnp.arange(b), best]
        return (images, scores) if return_scores else images

    def inpaint(
        self,
        prompts: Sequence[str],
        images: Array,
        keep_mask: Array,
        key: Array,
        config: SampleConfig = SampleConfig(),
    ) -> Array:
        """Regenerate the masked-out region of `images` under new prompts.

        keep_mask: (B, h, w) bool over the LATENT grid; True = keep original.
        """
        b = len(prompts)
        cond = self.conditioning(prompts)
        uncond = self.null_conditioning(b)
        tokens0 = self.encode_image_tokens(images)
        out = sample(
            self.model,
            self.params,
            key,
            cond,
            tokens0.shape,
            uncond,
            config,
            fixed_mask=keep_mask,
            fixed_tokens=tokens0,
        )
        return self._decode_clipped(out)

    def outpaint(
        self,
        prompts: Sequence[str],
        images: Array,
        canvas_hw: tuple[int, int],
        offset: tuple[int, int],
        key: Array,
        config: SampleConfig = SampleConfig(),
    ) -> Array:
        """Extend `images` onto a larger canvas; the original content is pinned."""
        b = len(prompts)
        cond = self.conditioning(prompts)
        uncond = self.null_conditioning(b)
        tokens0 = self.encode_image_tokens(images)
        ch, cw = self._latent_hw(canvas_hw)
        oy, ox = self._latent_hw(offset)
        k_canvas, k_sample = jax.random.split(key)
        init_x, fixed_mask = outpaint_canvas(
            tokens0, (ch, cw), (oy, ox), self.model.config.num_labels, k_canvas
        )
        out = sample(
            self.model,
            self.params,
            k_sample,
            cond,
            (b, ch, cw),
            uncond,
            config,
            init_x=init_x,
            fixed_mask=fixed_mask,
            fixed_tokens=init_x,
        )
        return self._decode_clipped(out)

    def img2img(
        self,
        prompts: Sequence[str],
        images: Array,
        key: Array,
        strength: float = 0.8,
        config: SampleConfig = SampleConfig(),
    ) -> Array:
        """Start sampling from the tokens of `images` at t_start=strength
        (the reference sampler's init_x path, src_distributed/utils.py:105-107)."""
        b = len(prompts)
        cond = self.conditioning(prompts)
        uncond = self.null_conditioning(b)
        tokens0 = self.encode_image_tokens(images)
        cfg = dataclasses.replace(config, t_start=strength)
        out = sample(
            self.model, self.params, key, cond, tokens0.shape, uncond, cfg, init_x=tokens0
        )
        return self._decode_clipped(out)

    def interpolate(self, image_a: Array, image_b: Array, n: int, decode: bool = True) -> Array:
        """Latent interpolation between two images (n frames incl. endpoints)."""
        ta = self.encode_image_tokens(image_a[None])[0]
        tb = self.encode_image_tokens(image_b[None])[0]
        codebook = self._codebook()
        frames = interpolate_latents(ta, tb, codebook, jnp.linspace(0.0, 1.0, n))
        return self._decode_clipped(frames) if decode else frames

    def _codebook(self) -> Array:
        vars_ = self.vq_vars
        params = vars_["params"] if "params" in vars_ else vars_
        return params["vquantizer"]["codebook"]

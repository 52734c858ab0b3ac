"""Configuration dataclasses.

The reference has no config system — hyperparameters are module-level globals edited
in-source (reference: src/train.py:10-22, src_distributed/train.py:14-30) and model
knobs live in constructor defaults (src/modules.py:110-112). Here the same knob set
is exposed as frozen (hashable, jit-static-friendly) dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PaellaConfig:
    """Denoiser hyperparameters (reference: src/modules.py:110-112 defaults)."""

    c_in: int = 256
    c_out: int = 256
    num_labels: int = 8192
    c_r: int = 64
    patch_size: int = 2
    c_cond: int = 1024
    c_hidden: Tuple[int, ...] = (640, 1280, 1280)
    nhead: Tuple[int, ...] = (-1, 16, 16)
    blocks: Tuple[int, ...] = (6, 16, 6)
    level_config: Tuple[str, ...] = ("CT", "CTA", "CTA")
    clip_embd: int = 1024
    byt5_embd: int = 1536
    clip_seq_len: int = 4
    kernel_size: int = 3
    dropout: Tuple[float, ...] = (0.1, 0.1, 0.1)
    self_attn: bool = True
    dtype: str = "float32"  # compute dtype; params are always float32
    remat: bool = False  # jax.checkpoint every block (training memory for FLOPs)
    # Per-level override of `remat` for the scanned repetitions (index = UNet
    # level, applied to both down and up passes). None -> `remat` everywhere.
    # e.g. (True, False, False): recompute only level 0 (the largest
    # activations) and store levels 1-2, trading a little memory for skipping
    # their backward recompute. Purely an efficiency knob — gradients are
    # identical either way.
    remat_levels: Optional[Tuple[bool, ...]] = None
    attention_impl: str = "xla"  # "xla" | "pallas" (fused VMEM-resident kernel)
    # Evaluate ResBlock(+FiLM) pairs with the fused Pallas kernel at inference
    # (kernels/resblock.py). Parameter tree is identical either way; blocks
    # whose activations exceed the kernel's VMEM budget fall back to XLA.
    fused_blocks: bool = False
    # Evaluate whole attention blocks with kernels/attn_block.py in the fused
    # loop. Measured SLOWER than XLA attention on v5e (89.7 vs 84.5 ms
    # sampler module wall; head-padding FLOPs and in-kernel relayouts outweigh
    # the dispatch savings) — kept for other geometries/hardware.
    attn_block_kernel: bool = False
    # Evaluate the scanned attention blocks' q/kv/o projections as 2D matmuls
    # ((B*S, C) @ (C, N)) instead of batched 3D dots. Motivation: XLA's
    # batched-dot layout assignment relayouts the (B, S, C) operands
    # {2,1,0}->{1,2,0} per repetition (traced: ~166 us/step of copies in the
    # level-1 scans). MEASURED SLOWER on v5e (12.20 vs 11.62 ms/forward,
    # scripts/ab_attn2d.py): the preferred layout speeds the dots by more
    # than the copies cost. Kept for other geometries/hardware.
    attn_qkvo_2d: bool = False
    # Keep these levels' activations in the even/odd-split channel layout
    # (models/layout.py): their up-path skip blocks' depthwise planes become
    # contiguous half-slices instead of strided lane gathers (measured
    # +125 us/block at up-0 and +41 at up-1 on-chip,
    # scripts/ab_skip_layout.py). Inference-only; requires fused_blocks=True
    # and params transformed by layout.split_skip_params (checkpoints stay
    # reference-ordered). Only levels i < n-1 have skip blocks.
    split_skip_levels: Tuple[int, ...] = ()
    # True W8A8 inference for the fused ResBlock fc matmuls: s8 x s8 on the
    # MXU (measured 1.35-1.66x the bf16 fc rate at the 1B shapes) with
    # in-kernel dynamic per-row activation quantization. Requires
    # fused_blocks=True and quant.quantize_paella_int8 weights; engages only
    # where kernel_scale leaves are present. QUALITY-GATED: validate FID on
    # real checkpoints before production use.
    act_quant: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def v1_byt5_xl(cls) -> "PaellaConfig":
        """Config trained by the distributed reference trainer
        (reference: src_distributed/train.py:48, byt5_embd=2560 for ByT5-XL)."""
        return cls(byt5_embd=2560)

    @classmethod
    def v1_byt5_xl_inference(cls) -> "PaellaConfig":
        """The flagship config on the measured-fastest inference path: bf16
        compute + the fused ResBlock/FiLM Pallas kernel (bench.py's setup)."""
        return cls(byt5_embd=2560, dtype="bfloat16", fused_blocks=True)

    @classmethod
    def tiny(cls) -> "PaellaConfig":
        """Small config for tests and dry runs."""
        return cls(
            c_in=16,
            c_out=16,
            num_labels=128,
            c_r=16,
            c_cond=32,
            c_hidden=(32, 64, 64),
            nhead=(-1, 4, 4),
            blocks=(1, 2, 1),
            byt5_embd=24,
            clip_embd=32,
            dropout=(0.0, 0.0, 0.0),
        )


@dataclasses.dataclass(frozen=True)
class VQConfig:
    """f4 codec hyperparameters (reference: src/vqgan.py:46-47)."""

    levels: int = 2
    bottleneck_blocks: int = 12
    c_hidden: int = 384
    c_latent: int = 4
    codebook_size: int = 8192
    scale_factor: float = 0.3764
    dtype: str = "float32"
    # nearest-neighbor search implementation for encode: "xla" or "pallas"
    # (kernels/quantize.py streams codebook tiles through VMEM)
    lookup_impl: str = "xla"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def downscale(self) -> int:
        """Total spatial downsampling: PixelUnshuffle(2) x stride-2 per extra level."""
        return 2 * (2 ** (self.levels - 1))

    @classmethod
    def tiny(cls) -> "VQConfig":
        return cls(bottleneck_blocks=2, c_hidden=32, codebook_size=128)


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Sampler schedule (reference: src_distributed/utils.py:97 signature).

    renoise_steps / sampling_conditional_steps of None mean steps-1 / steps, as in
    the reference (src_distributed/utils.py:99-102).
    """

    steps: int = 12
    renoise_steps: Optional[int] = None
    temperature: Tuple[float, float] = (0.7, 0.3)
    # scalar cfg (the simple reference sampler's form, src/utils.py:35) or a
    # (start, end) per-step schedule (src_distributed/utils.py:97); None disables
    cfg: Optional[object] = (8.0, 8.0)
    t_start: float = 1.0
    t_end: float = 0.0
    sampling_conditional_steps: Optional[int] = None
    # "xla": jax.random.categorical. "pallas": in-VMEM Gumbel argmax
    # (kernels/sampling.py) — same distribution, different PRNG stream; skips
    # the 134 MB/step HBM round trip of materialized random bits.
    categorical_impl: str = "xla"
    # Precompute step-invariant conditioning activations (normalized embedding
    # table, cond mappers, per-rep kv projections) once outside the sampling
    # scan (Paella.gen_cond_cache). Bit-equal; off switch exists for A/B.
    cond_cache: bool = True

    def resolved(self) -> "SampleConfig":
        cfg = self.cfg
        if isinstance(cfg, (int, float)):
            cfg = (float(cfg), float(cfg))
        temperature = self.temperature
        if isinstance(temperature, (int, float)):
            temperature = (float(temperature), float(temperature))
        return dataclasses.replace(
            self,
            cfg=cfg,
            temperature=temperature,
            renoise_steps=self.steps - 1 if self.renoise_steps is None else self.renoise_steps,
            sampling_conditional_steps=(
                self.steps
                if self.sampling_conditional_steps is None
                else self.sampling_conditional_steps
            ),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: src_distributed/train.py:14-30)."""

    updates: int = 1_500_000
    warmup_updates: int = 10_000
    batch_size: int = 2048
    grad_accum_steps: int = 1
    lr: float = 1e-4
    grad_clip: float = 1.0
    label_smoothing: float = 0.1
    loss_weight_min: float = 0.3  # reference: src_distributed/modules.py:283 min_val
    # conditioning dropout probabilities (reference: src_distributed/train.py:79-97)
    byt5_drop_prob: float = 0.05
    clip_text_drop_prob: float = 0.9
    clip_image_drop_prob: float = 0.9
    t_min: float = 0.001  # reference: src_distributed/train.py:99 clamp
    checkpoint_every: int = 2000
    seed: int = 0
    # Storage dtype for BOTH Adam moments ("float32" | "bfloat16"). bfloat16
    # halves optimizer state (8 GB -> 4 GB at 1B: the difference between the
    # 1B step fitting one 16 GB v5e chip or not) and its HBM traffic; moment
    # math stays f32 (see trainer._scale_by_adam). Default matches the
    # reference's torch AdamW exactly.
    adam_moment_dtype: str = "float32"
    # Skip optimizer updates when any gradient is non-finite (params and
    # moments untouched that step; metrics report the running skip count).
    # Reference-parity: its fp16 AMP GradScaler skips inf/nan steps
    # (src_distributed/train.py AMP stack); bf16 overflows are rarer but the
    # same guard keeps one bad batch from destroying a 1.5M-step run.
    skip_nonfinite_updates: bool = True

"""Host-side multimodal preprocessing: image decode, resize, patchify,
prompt marker expansion, and the host-computed arrays the TPU vision
encoder consumes.

TPU re-design of the reference's ``src/openai/multimodal.rs`` (ImageData,
ImageProcessConfig, ImageProcessor, Qwen3VLImageProcessor,
compute_tokens_per_image) and ``qwen3_vl/input.rs``.  Differences:

- All pixel math is numpy (float32); images are decoded with PIL.
- The device side consumes ONE padded patch matrix per request plus
  host-precomputed gather indices (position-embedding bilinear taps,
  rotary angles, segment ids) so the vision encoder jit sees only
  statically-bucketed MXU-friendly shapes — no data-dependent control
  flow on device (the reference instead loops per image on the GPU,
  vision.rs:160-199).
"""

from __future__ import annotations

import base64
import io
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from candle_vllm_tpu.config import ModelConfig, VisionConfig

IMAGE_PLACEHOLDER = "<|CVT-IMAGE|>"

DEFAULT_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
DEFAULT_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

# padded patch-count buckets the encoder jit compiles for (closed set,
# like the engine's token buckets)
PATCH_BUCKETS = (64, 256, 1024, 4096, 16384)


@dataclass
class MultiModalInputs:
    """Per-request image payload handed to the engine.

    ``patches``: [num_patches, in_ch*tps*ps*ps] float32 — patchified,
    normalized pixels, all images concatenated in prompt order.
    ``grids``: per image (t, h, w) patch-grid dims (pre-merge).
    ``seed``: mixed into prefix-cache block hashes so identical token ids
    with different images never share cache blocks (reference:
    prefix_cache.rs:371-383 mix_seed).
    """

    patches: np.ndarray
    grids: List[Tuple[int, int, int]]
    seed: int = 0
    # merge-area divisor turning patch counts into prompt tokens
    merge_unit: int = 4
    # fixed-token families (gemma3: mm_tokens_per_image via avg-pool
    # projector) override the merge math
    tokens_override: Optional[int] = None

    @property
    def num_patches(self) -> int:
        return sum(t * h * w for t, h, w in self.grids)

    @property
    def num_image_tokens(self) -> int:
        # post-merge tokens the prompt must carry as <image_pad> ids
        if self.tokens_override is not None:
            return self.tokens_override
        return self.num_patches // self.merge_unit


@dataclass
class ImageProcessConfig:
    """Preprocessing knobs per model family (reference: multimodal.rs
    ImageProcessConfig + get_image_config, lines 41-838)."""

    model_type: str = "qwen3_vl"        # qwen3_vl | gemma3 | mistral3
    image_token: str = "<|image_pad|>"
    image_start_token: Optional[str] = "<|vision_start|>"
    image_end_token: Optional[str] = "<|vision_end|>"
    image_break_token: Optional[str] = None
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    max_height: int = 768
    max_width: int = 768
    min_pixels: int = 256 * 256
    max_pixels: Optional[int] = None
    mm_tokens_per_image: Optional[int] = None
    image_mean: np.ndarray = field(default_factory=lambda: DEFAULT_MEAN)
    image_std: np.ndarray = field(default_factory=lambda: DEFAULT_STD)
    absolute_resize: bool = False

    @classmethod
    def from_model_config(cls, config: ModelConfig) -> "ImageProcessConfig":
        v = config.vision or VisionConfig()
        arch = config.architecture
        if arch.startswith("Gemma3"):
            # fixed-size resize + fixed tokens/image (multimodal.rs:717-760)
            return cls(
                model_type="gemma3",
                image_token="<image_soft_token>",
                image_start_token="<start_of_image>",
                image_end_token="<end_of_image>",
                patch_size=v.patch_size,
                # SigLIP consumes raster-order patches; downsampling
                # happens in the avg-pool projector, not patch merging
                spatial_merge_size=1,
                temporal_patch_size=1,
                max_height=v.image_size,
                max_width=v.image_size,
                mm_tokens_per_image=config.extra.get("_outer_config", {}).get(
                    "mm_tokens_per_image", 256
                ),
                image_mean=np.asarray([0.5, 0.5, 0.5], np.float32),
                image_std=np.asarray([0.5, 0.5, 0.5], np.float32),
                absolute_resize=True,
            )
        if arch.startswith("Llama4"):
            # single global tile at the tower's fixed size; token count is
            # post-pixel-shuffle (side*r)^2.  The reference has NO llama4
            # arm in multimodal.rs — this exceeds reference parity.
            side = v.image_size // v.patch_size
            r = v.pixel_shuffle_ratio
            return cls(
                model_type="llama4",
                image_token="<|image|>",
                image_start_token="<|image_start|>",
                image_end_token="<|image_end|>",
                patch_size=v.patch_size,
                spatial_merge_size=1,
                temporal_patch_size=1,
                max_height=v.image_size,
                max_width=v.image_size,
                mm_tokens_per_image=int(round(side * side * r * r)),
                image_mean=np.asarray([0.5, 0.5, 0.5], np.float32),
                image_std=np.asarray([0.5, 0.5, 0.5], np.float32),
                absolute_resize=True,
            )
        if arch.startswith("Mistral3"):
            return cls(
                model_type="mistral3",
                image_token="[IMG]",
                image_start_token=None,
                image_end_token="[IMG_END]",
                image_break_token="[IMG_BREAK]",
                patch_size=v.patch_size,
                spatial_merge_size=v.spatial_merge_size,
                temporal_patch_size=1,
                max_height=1540,
                max_width=1540,
            )
        max_row = max(v.image_size, 768)
        return cls(
            model_type="qwen3_vl",
            patch_size=v.patch_size,
            spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            max_height=max_row,
            max_width=max_row,
            max_pixels=max_row * max_row,
        )


def load_image(source: str) -> np.ndarray:
    """Decode an image to an RGB uint8 array [H, W, 3].

    Accepts ``data:`` base64 URLs and raw base64; plain http(s) URLs are
    fetched when the environment allows egress (reference:
    load_image_from_url / load_image_from_base64, multimodal.rs:246-262).
    """
    from PIL import Image

    if source.startswith("http://") or source.startswith("https://"):
        import urllib.request

        with urllib.request.urlopen(source, timeout=30) as resp:  # noqa: S310
            data = resp.read()
    else:
        b64 = source.rsplit(",", 1)[-1]
        data = base64.b64decode(b64)
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, np.uint8)


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Exact resize via PIL bilinear; img uint8 [H, W, 3]."""
    from PIL import Image

    if img.shape[0] == h and img.shape[1] == w:
        return img
    pil = Image.fromarray(img).resize((w, h), Image.BILINEAR)
    return np.asarray(pil, np.uint8)


def _normalize(img: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] -> float32 [3, H, W] scaled + normalized."""
    x = img.astype(np.float32) / 255.0
    x = (x - mean) / std
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def compute_tokens_per_image(
    cfg: ImageProcessConfig, image_sizes: Sequence[Tuple[int, int]]
) -> List[int]:
    """Post-merge token count per image (reference: multimodal.rs:131-176)."""
    if cfg.model_type == "gemma3" and cfg.mm_tokens_per_image:
        return [cfg.mm_tokens_per_image] * len(image_sizes)
    denom = cfg.patch_size * cfg.spatial_merge_size
    return [(h // denom) * (w // denom) for h, w in image_sizes]


class Qwen3VLImageProcessor:
    """smart-resize + patchify in merge-group order (reference:
    qwen3_vl/input.rs Qwen3VLImageProcessor)."""

    def __init__(self, cfg: ImageProcessConfig):
        self.cfg = cfg
        # the reference resizes every image in a request to the first
        # image's target so all patch grids match (input.rs:109-115)
        self._fixed_hw: Optional[Tuple[int, int]] = None

    def smart_resize(self, h: int, w: int) -> Tuple[int, int]:
        c = self.cfg
        factor = c.patch_size * c.spatial_merge_size
        nh = max(int(round(h / factor)) * factor, factor)
        nw = max(int(round(w / factor)) * factor, factor)
        pixels = nh * nw
        max_pixels = c.max_pixels or (c.max_height * c.max_width)
        if pixels > max_pixels:
            beta = math.sqrt(pixels / max_pixels)
            nh = max(int(nh / beta) // factor * factor, factor)
            nw = max(int(nw / beta) // factor * factor, factor)
        elif pixels < c.min_pixels:
            beta = math.sqrt(c.min_pixels / pixels)
            nh = max(int(nh * beta) // factor * factor, factor)
            nw = max(int(nw * beta) // factor * factor, factor)
        return nh, nw

    def patchify(self, img: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        """uint8 [H, W, 3] -> (patches [t*gh*gw, C*tps*ps*ps] f32,
        (t, gh, gw)).  Rows are ordered in merge groups: all merge_size^2
        patches of one merged cell are consecutive (input.rs:135-152)."""
        c = self.cfg
        max_hw = (img.shape[0], img.shape[1])
        nh, nw = self._fixed_hw or self.smart_resize(*max_hw)
        if self._fixed_hw is None:
            self._fixed_hw = (nh, nw)
        x = _normalize(_resize(img, nh, nw), c.image_mean, c.image_std)
        # temporal repeat for still images
        x = np.repeat(x[None], c.temporal_patch_size, axis=0)  # [tps,C,H,W]
        tps, C, H, W = x.shape
        ps, m = c.patch_size, c.spatial_merge_size
        gh, gw = H // ps, W // ps
        grid_t = 1
        x = x.reshape(grid_t, tps, C, gh // m, m, ps, gw // m, m, ps)
        x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        patches = np.ascontiguousarray(
            x.reshape(grid_t * gh * gw, C * tps * ps * ps)
        )
        return patches, (grid_t, gh, gw)

    def process(
        self, images: Sequence[np.ndarray], prompt: Optional[str] = None
    ) -> Tuple[MultiModalInputs, Optional[str]]:
        """Patchify all images and expand IMAGE_PLACEHOLDER markers in the
        prompt to <|vision_start|><|image_pad|>*N<|vision_end|> runs."""
        c = self.cfg
        all_patches: List[np.ndarray] = []
        grids: List[Tuple[int, int, int]] = []
        for img in images:
            p, g = self.patchify(img)
            all_patches.append(p)
            grids.append(g)
        patches = (
            np.concatenate(all_patches, axis=0)
            if all_patches
            else np.zeros((0, 0), np.float32)
        )
        merge_area = c.spatial_merge_size ** 2
        mm = MultiModalInputs(patches=patches, grids=grids,
                              seed=_mm_seed(patches), merge_unit=merge_area)
        if prompt is not None:
            for t, gh, gw in grids:
                n = t * gh * gw // merge_area
                run = (
                    (c.image_start_token or "")
                    + c.image_token * n
                    + (c.image_end_token or "")
                )
                prompt = prompt.replace(IMAGE_PLACEHOLDER, run, 1)
        return mm, prompt


class TileImageProcessor:
    """Fixed/row-major tile processors (Gemma3 / Mistral3 family;
    reference: multimodal.rs ImageProcessor, lines 358-497).  Produces the
    same MultiModalInputs shape as the Qwen processor: patch rows in
    merge-group order so one vision-encoder layout serves every family."""

    def __init__(self, cfg: ImageProcessConfig):
        self.cfg = cfg
        self._fixed_hw: Optional[Tuple[int, int]] = None

    def target_size(self, h: int, w: int) -> Tuple[int, int]:
        c = self.cfg
        if c.absolute_resize:
            return c.max_height, c.max_width
        ratio = max(h / c.max_height, w / c.max_width)
        if ratio > 1.0:
            h = int(h / ratio)
            w = int(w / ratio)
        nh = ((max(h, 1) - 1) // c.patch_size + 1) * c.patch_size
        nw = ((max(w, 1) - 1) // c.patch_size + 1) * c.patch_size
        return nh, nw

    def patchify(self, img: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int, int]]:
        c = self.cfg
        nh, nw = self._fixed_hw or self.target_size(img.shape[0], img.shape[1])
        if self._fixed_hw is None and not c.absolute_resize:
            self._fixed_hw = (nh, nw)
        x = _normalize(_resize(img, nh, nw), c.image_mean, c.image_std)
        C, H, W = x.shape
        ps, m = c.patch_size, c.spatial_merge_size
        gh, gw = H // ps, W // ps
        x = x.reshape(C, gh // m, m, ps, gw // m, m, ps)
        x = x.transpose(1, 4, 2, 5, 0, 3, 6)
        patches = np.ascontiguousarray(x.reshape(gh * gw, C * ps * ps))
        return patches, (1, gh, gw)

    def process(
        self, images: Sequence[np.ndarray], prompt: Optional[str] = None
    ) -> Tuple[MultiModalInputs, Optional[str]]:
        c = self.cfg
        all_patches, grids = [], []
        for img in images:
            p, g = self.patchify(img)
            all_patches.append(p)
            grids.append(g)
        patches = (
            np.concatenate(all_patches, axis=0)
            if all_patches
            else np.zeros((0, 0), np.float32)
        )
        mm = MultiModalInputs(
            patches=patches, grids=grids, seed=_mm_seed(patches),
            merge_unit=c.spatial_merge_size ** 2,
            tokens_override=(
                c.mm_tokens_per_image * len(grids)
                if c.mm_tokens_per_image else None
            ),
        )
        if prompt is not None:
            for t, gh, gw in grids:
                m = c.spatial_merge_size
                rows, cols = gh // m, gw // m
                if c.mm_tokens_per_image:
                    body = c.image_token * c.mm_tokens_per_image
                elif c.image_break_token:
                    # mistral row layout: cols tokens + break per row,
                    # final break replaced by end (multimodal.rs:453-475)
                    body = (
                        (c.image_token * cols + c.image_break_token) * rows
                    )[: -len(c.image_break_token)] if rows else ""
                else:
                    body = c.image_token * (rows * cols)
                run = (c.image_start_token or "") + body + (
                    c.image_end_token or ""
                )
                prompt = prompt.replace(IMAGE_PLACEHOLDER, run, 1)
        return mm, prompt


def get_image_processor(config: ModelConfig):
    cfg = ImageProcessConfig.from_model_config(config)
    if cfg.model_type == "qwen3_vl":
        return Qwen3VLImageProcessor(cfg)
    return TileImageProcessor(cfg)


def _mm_seed(patches: np.ndarray) -> int:
    """Content hash of the pixel patches, mixed into prefix-cache block
    hashes (reference: prefix_cache.rs:371-383)."""
    import zlib

    if patches.size == 0:
        return 0
    return zlib.crc32(np.ascontiguousarray(patches[:: max(1, len(patches) // 64)]).tobytes())


def pad_patch_bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"{n} patches exceed the largest bucket "
                     f"{PATCH_BUCKETS[-1]}")


def vision_encoder_host_inputs(
    mm: MultiModalInputs,
    vision: VisionConfig,
    pad_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Compute everything data-dependent on grid sizes on HOST so the
    vision encoder jit is pure static-shaped math:

    - ``patches``  [Np, pd] f32, zero-padded to the bucket
    - ``seg_ids``  [Np] i32 (0 = padding, images numbered from 1):
      block-diagonal attention via segment-id equality (the TPU analogue
      of the reference's per-image attention loop, vision.rs:160-199)
    - ``pos_idx``  [4, Np] i32 + ``pos_w`` [4, Np] f32: bilinear taps into
      the learned pos-embed table (vision.rs fast_pos_embed_interpolate)
    - ``cos``/``sin`` [Np, head_dim] f32: 2D rotary from (row, col) patch
      coords in merge-group order (vision.rs rot_pos_emb)
    """
    m = vision.spatial_merge_size
    head_dim = vision.hidden_size // vision.num_heads
    rot_dim = head_dim // 2          # per-axis rotary sub-dim
    grid_side = int(round(math.sqrt(vision.num_position_embeddings)))

    total = sum(t * gh * gw for t, gh, gw in mm.grids)
    Np = pad_to or pad_patch_bucket(max(total, 1))
    pd = mm.patches.shape[1] if mm.patches.size else (
        vision.in_channels * vision.temporal_patch_size
        * vision.patch_size ** 2
    )

    patches = np.zeros((Np, pd), np.float32)
    if mm.patches.size:
        patches[:total] = mm.patches
    seg_ids = np.zeros(Np, np.int32)
    pos_idx = np.zeros((4, Np), np.int32)
    pos_w = np.zeros((4, Np), np.float32)
    rows = np.zeros(Np, np.int64)
    cols = np.zeros(Np, np.int64)

    t0 = 0
    for img_i, (t, gh, gw) in enumerate(mm.grids):
        n = t * gh * gw
        seg_ids[t0 : t0 + n] = img_i + 1

        # merge-group-order (row, col) coordinates
        r_coord = np.zeros(gh * gw, np.int64)
        c_coord = np.zeros(gh * gw, np.int64)
        i = 0
        for br in range(gh // m):
            for bc in range(gw // m):
                for ir in range(m):
                    for ic in range(m):
                        r_coord[i] = br * m + ir
                        c_coord[i] = bc * m + ic
                        i += 1
        for rep in range(t):
            rows[t0 + rep * gh * gw : t0 + (rep + 1) * gh * gw] = r_coord
            cols[t0 + rep * gh * gw : t0 + (rep + 1) * gh * gw] = c_coord

        # bilinear pos-embed taps over the grid_side x grid_side table
        h_vals = (
            np.linspace(0.0, grid_side - 1, gh)
            if gh > 1 else np.zeros(gh)
        )
        w_vals = (
            np.linspace(0.0, grid_side - 1, gw)
            if gw > 1 else np.zeros(gw)
        )
        hv = h_vals[r_coord]
        wv = w_vals[c_coord]
        hf = np.floor(hv).astype(np.int64)
        wf = np.floor(wv).astype(np.int64)
        hc = np.minimum(np.ceil(hv), grid_side - 1).astype(np.int64)
        wc = np.minimum(np.ceil(wv), grid_side - 1).astype(np.int64)
        dh = (hv - hf).astype(np.float32)
        dw = (wv - wf).astype(np.float32)
        taps_idx = np.stack(
            [
                hf * grid_side + wf,
                hf * grid_side + wc,
                hc * grid_side + wf,
                hc * grid_side + wc,
            ]
        )
        taps_w = np.stack(
            [(1 - dh) * (1 - dw), (1 - dh) * dw, dh * (1 - dw), dh * dw]
        )
        for rep in range(t):
            sl = slice(t0 + rep * gh * gw, t0 + (rep + 1) * gh * gw)
            pos_idx[:, sl] = taps_idx
            pos_w[:, sl] = taps_w
        t0 += n

    # 2D rotary: per-axis freqs of dim rot_dim/2 each; the concatenated
    # [row | col] angle vector is duplicated to cover head_dim
    inv = 1.0 / (
        10000.0 ** (np.arange(0, rot_dim, 2, dtype=np.float32) / rot_dim)
    )
    ang = np.concatenate(
        [rows[:, None] * inv[None, :], cols[:, None] * inv[None, :]], axis=1
    )  # [Np, rot_dim]
    emb = np.concatenate([ang, ang], axis=1).astype(np.float32)  # [Np, hd]
    return {
        "patches": patches,
        "seg_ids": seg_ids,
        "pos_idx": pos_idx,
        "pos_w": pos_w,
        "cos": np.cos(emb),
        "sin": np.sin(emb),
    }


def pixtral_host_inputs(
    mm: MultiModalInputs,
    vision: VisionConfig,
    pad_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Host-side static-shape inputs for the Pixtral tower (Mistral3-VL):
    padded patch rows, segment ids, and 2D rotary cos/sin built from the
    meshgrid position ids ``row * max_patches_per_side + col`` against the
    theta table (reference: mistral3_vl/vision.rs:15-36
    VisionRotaryEmbedding, :274-289 position_ids_in_meshgrid)."""
    m = vision.spatial_merge_size
    head_dim = vision.hidden_size // vision.num_heads
    max_side = vision.image_size // vision.patch_size

    total = sum(t * gh * gw for t, gh, gw in mm.grids)
    Np = pad_to or pad_patch_bucket(max(total, 1))
    pd = mm.patches.shape[1] if mm.patches.size else (
        vision.in_channels * vision.patch_size ** 2
    )
    patches = np.zeros((Np, pd), np.float32)
    if mm.patches.size:
        patches[:total] = mm.patches
    seg_ids = np.zeros(Np, np.int32)
    pos_ids = np.zeros(Np, np.int64)

    t0 = 0
    for img_i, (t, gh, gw) in enumerate(mm.grids):
        n = t * gh * gw
        seg_ids[t0 : t0 + n] = img_i + 1
        # merge-group-order (row, col) coords (tile processor layout)
        i = 0
        ids = np.zeros(gh * gw, np.int64)
        for br in range(gh // m):
            for bc in range(gw // m):
                for ir in range(m):
                    for ic in range(m):
                        ids[i] = (br * m + ir) * max_side + (bc * m + ic)
                        i += 1
        pos_ids[t0 : t0 + n] = np.tile(ids, t)
        t0 += n

    # true 2D rotary (HF PixtralRotaryEmbedding): row coords rotate the
    # EVEN inv_freq entries, column coords the ODD ones, concatenated —
    # NB the reference's vision.rs:19-35 instead multiplies the flat
    # meshgrid id by the full theta table (1D rope over flat ids), which
    # mismatches real HF checkpoints; we follow HF.
    inv = 1.0 / vision.rope_theta ** (
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    )
    rows = (pos_ids // max_side).astype(np.float64)
    cols = (pos_ids % max_side).astype(np.float64)
    ang = np.concatenate(
        [rows[:, None] * inv[0::2][None, :],
         cols[:, None] * inv[1::2][None, :]],
        axis=-1,
    )                                           # [Np, head_dim/2]
    return {
        "patches": patches,
        "seg_ids": seg_ids,
        "cos": np.cos(ang).astype(np.float32),
        "sin": np.sin(ang).astype(np.float32),
    }

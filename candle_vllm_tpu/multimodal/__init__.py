from candle_vllm_tpu.multimodal.processor import (
    IMAGE_PLACEHOLDER,
    ImageProcessConfig,
    MultiModalInputs,
    Qwen3VLImageProcessor,
    TileImageProcessor,
    compute_tokens_per_image,
    get_image_processor,
    load_image,
    vision_encoder_host_inputs,
)

__all__ = [
    "IMAGE_PLACEHOLDER",
    "ImageProcessConfig",
    "MultiModalInputs",
    "Qwen3VLImageProcessor",
    "TileImageProcessor",
    "compute_tokens_per_image",
    "get_image_processor",
    "load_image",
    "vision_encoder_host_inputs",
]

"""open_muse_tpu — a TPU-native (JAX / XLA / pjit / Pallas) framework for
MUSE-style masked generative image modeling.

Built from scratch with the capabilities of huggingface/open-muse (reference
layer map in SURVEY.md): four VQ image tokenizers, the MaskGit transformer and
MaskGiT-UViT-v2 masked-token models, parallel mask-predict decoding compiled
into a single XLA loop, a `transformers`-style from_pretrained/save_pretrained
API that can ingest the reference PyTorch checkpoints, and a GSPMD
data/fsdp/tensor-parallel training stack.
"""

__version__ = "0.1.0"

_LAZY_IMPORTS = {
    "ConfigMixin": ("open_muse_tpu.core.configuration", "ConfigMixin"),
    "register_to_config": ("open_muse_tpu.core.configuration", "register_to_config"),
    "ModelMixin": ("open_muse_tpu.core.modeling", "ModelMixin"),
    "MaskGitVQGAN": ("open_muse_tpu.models.maskgit_vqgan", "MaskGitVQGAN"),
    "VQGANModel": ("open_muse_tpu.models.taming_vqgan", "VQGANModel"),
    "MOVQ": ("open_muse_tpu.models.movq", "MOVQ"),
    "PaellaVQModel": ("open_muse_tpu.models.paella_vq", "PaellaVQModel"),
    "MaskGitTransformer": ("open_muse_tpu.models.transformer_v1", "MaskGitTransformer"),
    "MaskGiTUViT_v2": ("open_muse_tpu.models.transformer_v2", "MaskGiTUViT_v2"),
    "MaskGiTUViT": ("open_muse_tpu.models.transformer_v2", "MaskGiTUViT_v2"),
    "CLIPTextEncoder": ("open_muse_tpu.models.clip_text", "CLIPTextEncoder"),
    "T5TextEncoder": ("open_muse_tpu.models.t5_text", "T5TextEncoder"),
    "PipelineMuse": ("open_muse_tpu.pipelines.pipeline_muse", "PipelineMuse"),
    "PipelineMuseInpainting": ("open_muse_tpu.pipelines.pipeline_muse", "PipelineMuseInpainting"),
    "EMAModel": ("open_muse_tpu.training.ema", "EMAModel"),
    "get_scheduler": ("open_muse_tpu.training.lr_schedules", "get_scheduler"),
    "get_mask_schedule": ("open_muse_tpu.ops.sampling", "get_mask_schedule"),
    "get_mask_chedule": ("open_muse_tpu.ops.sampling", "get_mask_chedule"),
}

__all__ = list(_LAZY_IMPORTS)


def __getattr__(name):
    if name in _LAZY_IMPORTS:
        import importlib

        module_name, attr = _LAZY_IMPORTS[name]
        value = getattr(importlib.import_module(module_name), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

from mixofshow_tpu.utils.registry import TRANSFORM_REGISTRY, Registry

__all__ = ['Registry', 'TRANSFORM_REGISTRY']

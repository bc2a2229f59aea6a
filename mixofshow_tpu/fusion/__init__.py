from mixofshow_tpu.fusion.gradient_fusion import compose_concepts

__all__ = ['compose_concepts']

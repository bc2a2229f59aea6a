from mixofshow_tpu.pipelines.concepts import (bind_concept_prompt,
                                              init_concepts)
from mixofshow_tpu.pipelines.pipeline_edlora import EDLoRAPipeline
from mixofshow_tpu.pipelines.pipeline_regional import \
    RegionallyT2IAdapterPipeline

__all__ = ['bind_concept_prompt', 'init_concepts', 'EDLoRAPipeline',
           'RegionallyT2IAdapterPipeline']

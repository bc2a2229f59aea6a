from mixofshow_tpu.convert.diffusers_import import (convert_clip_text,
                                                    convert_edlora_delta,
                                                    convert_unet, convert_vae,
                                                    load_pipeline_params,
                                                    load_state_dict)

__all__ = ['convert_clip_text', 'convert_edlora_delta', 'convert_unet',
           'convert_vae', 'load_pipeline_params', 'load_state_dict']

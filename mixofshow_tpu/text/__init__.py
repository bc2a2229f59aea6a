from mixofshow_tpu.text.tokenizer import CLIPTokenizer

__all__ = ['CLIPTokenizer']

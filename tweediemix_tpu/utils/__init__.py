from tweediemix_tpu.utils.tokenizer import CLIPBPETokenizer, HashTokenizer

__all__ = ["CLIPBPETokenizer", "HashTokenizer"]

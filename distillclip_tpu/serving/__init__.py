from distillclip_tpu.serving.lclip_score import LCLIPScorer

__all__ = ["LCLIPScorer"]

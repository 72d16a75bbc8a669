from . import clip, hf_import, inference
from .clip import (CLIPOutput, TowerOutput, clip_forward, encode_image,
                   encode_text, init_clip_params, num_params,
                   sparc_embeddings, text_tower, vision_tower)
from .inference import CLIPInference, ZeroShotClassifier

__all__ = ["clip", "hf_import", "inference", "CLIPOutput", "TowerOutput",
           "clip_forward", "encode_image", "encode_text",
           "init_clip_params", "num_params", "sparc_embeddings",
           "text_tower", "vision_tower", "CLIPInference",
           "ZeroShotClassifier"]

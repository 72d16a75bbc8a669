from . import numbers
from .datasets import (CocoCaptionsDataset, CounterfactualCaptionDataset,
                       CountingDataPipeline, EpochBatchPipeline,
                       SyntheticCaptionDataset)
from .packed import PackedDataPipeline, pack_dataset
from .preprocess import (CLIP_MEAN, CLIP_STD, normalize_batch,
                         pad_to_square, preprocess_batch, preprocess_host,
                         resize_center_crop)
from .synthetic import (SIZE_CATEGORIES, CocoSource, ProceduralSource,
                        SyntheticCountGenerator,
                        generate_procedural_dataset, pack_box,
                        position_phrase, size_category)
from .tokenizer import (CLIPTokenizer, HashTokenizer, load_hf_tokenizer,
                        load_openai_bpe, load_tokenizer)

__all__ = [
    "numbers", "CocoCaptionsDataset", "CounterfactualCaptionDataset",
    "CountingDataPipeline", "EpochBatchPipeline", "PackedDataPipeline",
    "pack_dataset", "SyntheticCaptionDataset", "CLIP_MEAN",
    "CLIP_STD", "normalize_batch", "pad_to_square", "preprocess_batch",
    "preprocess_host", "resize_center_crop", "SIZE_CATEGORIES",
    "CocoSource", "ProceduralSource", "SyntheticCountGenerator",
    "generate_procedural_dataset", "pack_box", "position_phrase",
    "size_category", "CLIPTokenizer", "HashTokenizer", "load_hf_tokenizer",
    "load_openai_bpe", "load_tokenizer",
]

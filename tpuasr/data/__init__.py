from tpuasr.data.bznsyp import read_scp, read_text, split_dataset, normalize_pinyin
from tpuasr.data.pipeline import BatchSpec, LengthBucketPipeline

__all__ = [
    "read_scp",
    "read_text",
    "split_dataset",
    "normalize_pinyin",
    "BatchSpec",
    "LengthBucketPipeline",
]

from tpuasr.streaming.chunkwise import (
    chunk_stream_encode,
    chunk_windows,
    decoding_window,
    num_chunks,
)

__all__ = ["chunk_stream_encode", "chunk_windows", "decoding_window", "num_chunks"]

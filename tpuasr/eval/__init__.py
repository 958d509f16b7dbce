from tpuasr.eval.cer_eval import evaluate_offline
from tpuasr.eval.streaming_eval import evaluate_streaming
from tpuasr.eval.rtf import measure_rtf

__all__ = ["evaluate_offline", "evaluate_streaming", "measure_rtf"]

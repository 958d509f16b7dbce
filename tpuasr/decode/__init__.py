from tpuasr.decode.ctc_greedy import ctc_greedy_decode
from tpuasr.decode.rnnt_greedy import rnnt_greedy_decode

__all__ = ["ctc_greedy_decode", "rnnt_greedy_decode"]

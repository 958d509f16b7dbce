from tpuasr.models.ctc_model import CTCModel
from tpuasr.models.paraformer import Paraformer, ParaformerConfig
from tpuasr.models.transducer import Transducer, add_blank
from tpuasr.models.whisper import WhisperModel

__all__ = [
    "CTCModel", "Paraformer", "ParaformerConfig", "Transducer", "add_blank",
    "WhisperModel",
]

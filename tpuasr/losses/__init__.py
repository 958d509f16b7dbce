from tpuasr.losses.ctc import ctc_loss, ctc_loss_from_logits
from tpuasr.losses.rnnt import rnnt_loss, rnnt_loss_from_logits

__all__ = ["ctc_loss", "ctc_loss_from_logits", "rnnt_loss", "rnnt_loss_from_logits"]

from tpuasr.text.tokenizer import Tokenizer, CharTokenizer
from tpuasr.text.cer import cer_details, corpus_cer
from tpuasr.text.pinyin import PINYIN_SYLLABLES

__all__ = ["Tokenizer", "CharTokenizer", "cer_details", "corpus_cer", "PINYIN_SYLLABLES"]

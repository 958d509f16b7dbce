"""Whisper-style AED: task/language special-token conditioning over the
attention encoder-decoder.

Parity: wenet/whisper/whisper.py:28-93 (Whisper(ASRModel) overriding
`_calc_att_loss` with whisper token assembly) and the prompt grammar of
wenet/utils/common.py:159-230 (`add_whisper_tokens`):

    [sot] -> [lang id] -> [transcribe|translate] -> [no_timestamps]
                       -> [no_speech (vad)]      -> [no_speech]
    -> text tokens -> [eot]

TPU redesign: the reference assembles prompts in a Python loop over string
task/lang tags; here tasks and languages are integer arrays and the 4-token
prompt is built with vectorized selects — static shapes, jit-friendly, and
batch-heterogeneous (each utterance may carry its own task/language).
Timestamp mode and [PREV] hotword prompts raise in the reference too
(common.py:194, 217) and are out of scope. The OpenAI checkpoint converter
is an explicit non-goal (SURVEY §7); this is the model class.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.config import EncoderConfig
from tpuasr.losses import ctc_loss_from_logits
from tpuasr.nn.conformer import ConformerEncoder
from tpuasr.nn.decoder import TransformerDecoder, label_smoothing_loss
from tpuasr.nn.subsampling import subsampled_len

TASK_TRANSCRIBE = 0
TASK_TRANSLATE = 1
TASK_VAD = 2

PROMPT_LEN = 4  # [sot, lang, task, no_timestamps|no_speech]


@dataclass
class WhisperSpecialTokens:
    """Special-token ids (whisper 'sot'/'eot' naming; ids are vocabulary-
    specific — defaults fit a small course vocab, converters can override)."""

    sot: int = 2
    eot: int = 3
    transcribe: int = 6
    translate: int = 7
    no_timestamps: int = 8
    no_speech: int = 9
    lang_base: int = 10  # language id = lang_base + lang_index (sot+1 rule)


@dataclass
class WhisperConfig:
    vocab_size: int = 412
    blank_id: int = 5
    num_languages: int = 2
    special: WhisperSpecialTokens = field(default_factory=WhisperSpecialTokens)
    lsm_weight: float = 0.1
    ctc_weight: float = 0.0  # whisper trains attention-only by default
    decoder_blocks: int = 6
    decoder_heads: int = 4
    decoder_ffn: int = 1024
    compute_dtype: str = "float32"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)


class WhisperModel(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = ConformerEncoder(c.encoder, dtype, name="encoder")
        self.decoder = TransformerDecoder(
            c.vocab_size, c.encoder.output_size, c.decoder_heads, c.decoder_ffn,
            c.decoder_blocks, c.encoder.dropout_rate, c.encoder.max_len, dtype,
            name="decoder",
        )
        if c.ctc_weight > 0:
            self.ctc_lo = nn.Dense(c.vocab_size, name="ctc_lo")

    # ------------------------------------------------------------------

    def prompt_tokens(self, langs: jnp.ndarray, tasks: jnp.ndarray) -> jnp.ndarray:
        """[B] lang indices + [B] task codes -> [B, 4] whisper prompt
        (add_whisper_tokens grammar, vectorized)."""
        sp = self.cfg.special
        b = langs.shape[0]
        sot = jnp.full((b,), sp.sot, jnp.int32)
        lang = (sp.lang_base + langs).astype(jnp.int32)
        task = jnp.select(
            [tasks == TASK_TRANSCRIBE, tasks == TASK_TRANSLATE],
            [jnp.full((b,), sp.transcribe, jnp.int32),
             jnp.full((b,), sp.translate, jnp.int32)],
            jnp.full((b,), sp.no_speech, jnp.int32),
        )
        tail = jnp.where(tasks == TASK_VAD, sp.no_speech, sp.no_timestamps).astype(
            jnp.int32
        )
        return jnp.stack([sot, lang, task, tail], axis=1)

    def encode(self, feats, feat_lens, deterministic: bool = True):
        ys, _ = self.encoder(feats, feat_lens, deterministic=deterministic)
        return ys, subsampled_len(self.cfg.encoder.input_layer, feat_lens)

    def ctc_logits(self, enc_out):
        return self.ctc_lo(enc_out)

    # AR decode surface (same contract as ASRModel)
    def decoder_project_memory(self, memory):
        return self.decoder.project_memory(memory)

    def decoder_init_cache(self, batch, lmax):
        return self.decoder.init_ar_cache(batch, lmax)

    def decoder_one_step(self, tokens, pos, kcache, vcache, mem_k, mem_v, mem_mask):
        return self.decoder.forward_one_step(
            tokens, pos, kcache, vcache, mem_k, mem_v, mem_mask
        )

    # ------------------------------------------------------------------

    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        texts: jnp.ndarray,  # [B, U] bare token ids
        text_lens: jnp.ndarray,  # [B]
        langs: jnp.ndarray | None = None,  # [B] language indices
        tasks: jnp.ndarray | None = None,  # [B] task codes
        deterministic: bool = True,
    ) -> dict:
        """Teacher-forced loss: decoder input = prompt + text, target =
        prompt[1:] + text + eot (every token after sot supervised, whisper
        convention)."""
        c = self.cfg
        b, u = texts.shape
        if langs is None:
            langs = jnp.zeros((b,), jnp.int32)
        if tasks is None:
            tasks = jnp.full((b,), TASK_TRANSCRIBE, jnp.int32)

        enc_out, enc_lens = self.encode(feats, feat_lens, deterministic)

        prompt = self.prompt_tokens(langs, tasks)  # [B, 4]
        ys_in = jnp.concatenate([prompt, texts.astype(jnp.int32)], axis=1)
        # target = input shifted left, with eot at position 3 + text_len
        ys_out = jnp.concatenate(
            [ys_in[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        out_idx = jnp.arange(u + PROMPT_LEN)[None, :]
        eot_slot = out_idx == (PROMPT_LEN - 1 + text_lens)[:, None]
        ys_out = jnp.where(eot_slot, c.special.eot, ys_out)
        dec_lens = text_lens + PROMPT_LEN

        logits = self.decoder(enc_out, enc_lens, ys_in, dec_lens, deterministic)
        loss_att = label_smoothing_loss(logits, ys_out, dec_lens, c.lsm_weight)
        out = {"loss_att": loss_att}
        loss = loss_att
        if c.ctc_weight > 0:
            loss_ctc = ctc_loss_from_logits(
                self.ctc_lo(enc_out), enc_lens, texts, text_lens, c.blank_id,
                "sum_over_batch",
            )
            loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_att
            out["loss_ctc"] = loss_ctc
        out["loss"] = loss
        return out


def whisper_greedy_decode(
    model: WhisperModel,
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    langs: jnp.ndarray,  # [B]
    tasks: jnp.ndarray,  # [B]
    max_tokens: int = 100,
):
    """Prompt-conditioned greedy AR decode -> (tokens [B, max_tokens],
    lens [B]). The 4-token prompt is force-fed (teacher forcing through the
    AR cache), then text tokens are argmax-decoded until eot."""
    sp = model.cfg.special
    b, t, _ = enc_out.shape
    lmax = max_tokens + PROMPT_LEN + 1

    prompt = model.apply(params, langs, tasks, method="prompt_tokens")
    mem_k, mem_v = model.apply(params, enc_out, method="decoder_project_memory")
    kc, vc = model.apply(params, b, lmax, method="decoder_init_cache")
    mem_mask = (jnp.arange(t)[None, None, :] < enc_lens[:, None, None])

    def one_step(tokens, pos, kc, vc):
        return model.apply(
            params, tokens, pos, kc, vc, mem_k, mem_v, mem_mask,
            method="decoder_one_step",
        )

    # prefill the prompt (the last prompt step's logits start the text)
    def prefill(carry, i):
        kc, vc, _ = carry
        lp, kc, vc = one_step(prompt[:, i], i, kc, vc)
        return (kc, vc, lp), None

    (kc, vc, lp), _ = jax.lax.scan(
        prefill, (kc, vc, jnp.zeros((b, model.cfg.vocab_size))),
        jnp.arange(PROMPT_LEN),
    )

    tokens0 = jnp.zeros((b, max_tokens), jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def step(carry, i):
        kc, vc, lp, tokens, done = carry
        nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        is_eot = nxt == sp.eot
        emit = ~done & ~is_eot
        tokens = tokens.at[:, i].set(jnp.where(emit, nxt, 0))
        done = done | is_eot
        feed = jnp.where(done, sp.eot, nxt)
        lp2, kc, vc = one_step(feed, PROMPT_LEN + i, kc, vc)
        return (kc, vc, lp2, tokens, done), emit

    (kc, vc, lp, tokens, done), emits = jax.lax.scan(
        step, (kc, vc, lp, tokens0, done0), jnp.arange(max_tokens)
    )
    lens = jnp.sum(emits.astype(jnp.int32), axis=0)
    return tokens, lens


def whisper_beam_decode(
    model: WhisperModel,
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    langs: jnp.ndarray,  # [B]
    tasks: jnp.ndarray,  # [B]
    beam_size: int = 10,
    max_tokens: int = 100,
    length_penalty: float = 0.0,
):
    """Prompt-conditioned attention beam search (the reference decodes
    whisper through attention_beam_search with the 4-token prompt prefix,
    wenet/transformer/search.py:265-279) -> (tokens, lens, nbest scores)."""
    from tpuasr.decode.attention_beam import attention_beam_search

    prompt = model.apply(params, langs, tasks, method="prompt_tokens")
    sp = model.cfg.special
    return attention_beam_search(
        model, params, enc_out, enc_lens, sp.sot, sp.eot,
        beam_size=beam_size, max_len=max_tokens, prompt=prompt,
        length_penalty=length_penalty,
    )

"""Mapping-spec parity for the SpeechBrain TransformerASR/TransformerLM
torch layouts (utils/reference_ckpts.port_sb_asr_state_dict / _lm_).

The reference's Pretrainer fetches ``asr.ckpt``/``lm.ckpt`` from HF
(convae.yaml:306-317); the files are not shipped, but the state-dict layout
is fixed by SpeechBrain 0.5's module structure and the architecture pinned
at transformer.yaml:128-173. These tests construct torch REPLICAS with
exactly that key layout and forward semantics (post-norm + final stack
norms, exact GELU, symmetric conv padding, sqrt(d_model) embedding scale,
SB's LM output head), port fresh random weights through the spec into the
sb_compat flax modules, and assert forward parity <=1e-4 — the same method
test_reference_ckpt_port.py uses for the shipped FC-AE/classifier ckpts.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


# ---------------------------------------------------------------- SB replicas

class SBLinear(nn.Module):  # speechbrain.nnet.linear.Linear: wraps .w
    def __init__(self, n_in, n_out):
        super().__init__()
        self.w = nn.Linear(n_in, n_out)

    def forward(self, x):
        return self.w(x)


class SBLayerNorm(nn.Module):  # speechbrain.nnet.normalization.LayerNorm: .norm
    def __init__(self, shape, eps=1e-5):
        super().__init__()
        self.norm = nn.LayerNorm(shape, eps=eps)

    def forward(self, x):
        return self.norm(x)


class SBModuleList(nn.Module):  # speechbrain.nnet.containers.ModuleList: .layers
    def __init__(self, *mods):
        super().__init__()
        self.layers = nn.ModuleList(mods)

    def forward(self, x):
        for m in self.layers:
            x = m(x)
        return x


class SBEmbedding(nn.Module):  # speechbrain.nnet.embedding.Embedding: .Embedding
    def __init__(self, vocab, dim, blank_id=0):
        super().__init__()
        self.Embedding = nn.Embedding(vocab, dim, padding_idx=blank_id)

    def forward(self, x):
        return self.Embedding(x)


class NormalizedEmbedding(nn.Module):  # Transformer.py: .emb, * sqrt(d_model)
    def __init__(self, d_model, vocab):
        super().__init__()
        self.emb = SBEmbedding(vocab, d_model, blank_id=0)
        self.d_model = d_model

    def forward(self, x):
        return self.emb(x) * math.sqrt(self.d_model)


class SBMHA(nn.Module):  # speechbrain.nnet.attention.MultiheadAttention: .att
    def __init__(self, d_model, nhead):
        super().__init__()
        self.att = nn.MultiheadAttention(d_model, nhead, dropout=0.0)

    def forward(self, q, k, v, attn_mask=None, key_padding_mask=None):
        q, k, v = (t.permute(1, 0, 2) for t in (q, k, v))
        out, _ = self.att(q, k, v, attn_mask=attn_mask,
                          key_padding_mask=key_padding_mask)
        return out.permute(1, 0, 2)


class SBPosFFN(nn.Module):  # PositionalwiseFeedForward: .ffn Sequential 0..3
    def __init__(self, d_model, d_ffn):
        super().__init__()
        self.ffn = nn.Sequential(
            nn.Linear(d_model, d_ffn), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(d_ffn, d_model),
        )

    def forward(self, x):
        return self.ffn(x)


class SBEncoderLayer(nn.Module):  # post-norm (normalize_before=False)
    def __init__(self, d_model, nhead, d_ffn):
        super().__init__()
        self.self_att = SBMHA(d_model, nhead)
        self.pos_ffn = SBPosFFN(d_model, d_ffn)
        self.norm1 = SBLayerNorm(d_model, eps=1e-6)
        self.norm2 = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, src, src_mask=None, src_key_padding_mask=None):
        out = self.self_att(src, src, src, attn_mask=src_mask,
                            key_padding_mask=src_key_padding_mask)
        src = self.norm1(src + out)
        out = self.pos_ffn(src)
        return self.norm2(src + out)


class SBEncoder(nn.Module):  # TransformerEncoder: .layers + final .norm
    def __init__(self, n_layers, d_model, nhead, d_ffn):
        super().__init__()
        self.layers = nn.ModuleList(
            SBEncoderLayer(d_model, nhead, d_ffn) for _ in range(n_layers)
        )
        self.norm = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, src, src_mask=None, src_key_padding_mask=None):
        for layer in self.layers:
            src = layer(src, src_mask, src_key_padding_mask)
        return self.norm(src)


class SBDecoderLayer(nn.Module):
    def __init__(self, d_model, nhead, d_ffn):
        super().__init__()
        self.self_attn = SBMHA(d_model, nhead)
        # SB 0.5's Transformer.py spells the cross-attention "mutihead_attn"
        self.mutihead_attn = SBMHA(d_model, nhead)
        self.pos_ffn = SBPosFFN(d_model, d_ffn)
        self.norm1 = SBLayerNorm(d_model, eps=1e-6)
        self.norm2 = SBLayerNorm(d_model, eps=1e-6)
        self.norm3 = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, tgt, memory, tgt_mask=None, tgt_key_padding_mask=None,
                memory_key_padding_mask=None):
        out = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                             key_padding_mask=tgt_key_padding_mask)
        tgt = self.norm1(tgt + out)
        out = self.mutihead_attn(tgt, memory, memory,
                                 key_padding_mask=memory_key_padding_mask)
        tgt = self.norm2(tgt + out)
        out = self.pos_ffn(tgt)
        return self.norm3(tgt + out)


class SBDecoder(nn.Module):
    def __init__(self, n_layers, d_model, nhead, d_ffn):
        super().__init__()
        self.layers = nn.ModuleList(
            SBDecoderLayer(d_model, nhead, d_ffn) for _ in range(n_layers)
        )
        self.norm = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, tgt, memory, tgt_mask=None, tgt_key_padding_mask=None,
                memory_key_padding_mask=None):
        for layer in self.layers:
            tgt = layer(tgt, memory, tgt_mask, tgt_key_padding_mask,
                        memory_key_padding_mask)
        return self.norm(tgt)


class SBConv2dWrap(nn.Module):  # speechbrain.nnet.CNN.Conv2d: .conv, (B,T,F,C)
    def __init__(self, in_ch, out_ch, k, s):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=s, padding=k // 2)

    def forward(self, x):
        return self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)


class SBConvUnit(nn.Module):  # ConvBlock.convs: conv_0 / norm_0 / LeakyReLU
    def __init__(self, in_ch, out_ch, k, s, f_out):
        super().__init__()
        self.conv_0 = SBConv2dWrap(in_ch, out_ch, k, s)
        self.norm_0 = SBLayerNorm((f_out, out_ch), eps=1e-5)

    def forward(self, x):
        return torch.nn.functional.leaky_relu(self.norm_0(self.conv_0(x)), 0.01)


class SBConvBlock(nn.Module):
    def __init__(self, *a):
        super().__init__()
        self.convs = SBConvUnit(*a)

    def forward(self, x):
        return self.convs(x)


class SBCNN(nn.Module):  # ConvolutionFrontEnd, transformer.yaml:128-135
    def __init__(self, f_in=80):
        super().__init__()
        f1 = (f_in + 2 - 3) // 2 + 1
        f2 = (f1 + 2 - 3) // 2 + 1
        self.convblock_0 = SBConvBlock(1, 128, 3, 2, f1)
        self.convblock_1 = SBConvBlock(128, 256, 3, 2, f2)
        self.convblock_2 = SBConvBlock(256, 512, 1, 1, f2)

    def forward(self, x):  # (B, T, F) -> (B, T', F', C)
        x = self.convblock_0(x[..., None])
        x = self.convblock_1(x)
        return self.convblock_2(x)


def sb_positional_encoding(t, d):
    pe = np.zeros((t, d), np.float32)
    pos = np.arange(t)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d, 2).astype(np.float32) * -(math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return torch.from_numpy(pe)[None]


class SBTransformerASR(nn.Module):
    def __init__(self, vocab, input_size, d_model, nhead, n_enc, n_dec, d_ffn):
        super().__init__()
        self.d_model = d_model
        self.custom_src_module = SBModuleList(
            SBLinear(input_size, d_model), nn.Dropout(0.0)
        )
        self.custom_tgt_module = SBModuleList(NormalizedEmbedding(d_model, vocab))
        self.encoder = SBEncoder(n_enc, d_model, nhead, d_ffn)
        self.decoder = SBDecoder(n_dec, d_model, nhead, d_ffn)

    def forward(self, src, tgt, pad_idx=0):
        if src.dim() == 4:
            b, t, f, c = src.shape
            src = src.reshape(b, t, f * c)
        u = tgt.shape[1]
        tgt_mask = torch.triu(torch.ones(u, u), diagonal=1).bool()
        tgt_kpm = tgt == pad_idx
        src = self.custom_src_module(src)
        src = src + sb_positional_encoding(src.shape[1], self.d_model)
        enc = self.encoder(src)
        tgt = self.custom_tgt_module(tgt)
        tgt = tgt + sb_positional_encoding(u, self.d_model)
        dec = self.decoder(tgt, enc, tgt_mask=tgt_mask, tgt_key_padding_mask=tgt_kpm)
        return enc, dec


class SBTransformerLM(nn.Module):
    def __init__(self, vocab, d_model, nhead, n_layers, d_ffn):
        super().__init__()
        self.d_model = d_model
        self.custom_src_module = NormalizedEmbedding(d_model, vocab)
        self.encoder = SBEncoder(n_layers, d_model, nhead, d_ffn)
        self.output_proj = SBModuleList(
            SBLinear(d_model, d_model // 2),
            SBLayerNorm(d_model // 2, eps=1e-5),
            SBLinear(d_model // 2, vocab),
        )

    def forward(self, src, pad_idx=0):
        u = src.shape[1]
        src_mask = torch.triu(torch.ones(u, u), diagonal=1).bool()
        kpm = src == pad_idx
        x = self.custom_src_module(src)
        x = x + sb_positional_encoding(u, self.d_model)
        x = self.encoder(x, src_mask=src_mask, src_key_padding_mask=kpm)
        return self.output_proj(x)


# -------------------------------------------------------------------- tests

DIMS = dict(d_model=32, nhead=4, n_enc=2, n_dec=2, d_ffn=48, vocab=40)


def _count_params(module):
    return sum(p.numel() for p in module.parameters())


def test_asr_port_forward_parity():
    from speech_anonymization_tpu.models.asr import ASRModel
    from speech_anonymization_tpu.utils.reference_ckpts import (
        port_sb_asr_state_dict,
    )
    from speech_anonymization_tpu.utils.port_weights import merge_params

    torch.manual_seed(0)
    d = DIMS
    f2 = 20  # 80 -> 40 -> 20 over the two stride-2 blocks
    full = nn.ModuleList([
        SBCNN(80),
        SBTransformerASR(d["vocab"], f2 * 512, d["d_model"], d["nhead"],
                         d["n_enc"], d["n_dec"], d["d_ffn"]),
        SBLinear(d["d_model"], d["vocab"]),  # slot 2 = seq_lin
        SBLinear(d["d_model"], d["vocab"]),  # slot 3 = ctc_lin
    ])
    full.eval()
    sd = full.state_dict()

    b, t, u = 2, 12, 6
    feats = torch.randn(b, t, 80)
    tokens = torch.tensor([[1, 5, 6, 9, 3, 4], [1, 7, 3, 0, 0, 0]])
    with torch.no_grad():
        cnn_out = full[0](feats)
        enc_t, dec_t = full[1](cnn_out, tokens)
        seq_t = torch.log_softmax(full[2](dec_t), -1)
        ctc_t = torch.log_softmax(full[3](enc_t), -1)

    model = ASRModel(
        d_model=d["d_model"], nhead=d["nhead"], num_encoder_layers=d["n_enc"],
        num_decoder_layers=d["n_dec"], d_ffn=d["d_ffn"],
        output_neurons=d["vocab"], sb_compat=True,
    )
    feats_j = jnp.asarray(feats.numpy())
    toks_j = jnp.asarray(tokens.numpy())
    lens = jnp.ones((b,))
    variables = model.init(jax.random.PRNGKey(0), feats_j, toks_j, lens)
    patch = port_sb_asr_state_dict(sd, nhead=d["nhead"],
                                   num_encoder_layers=d["n_enc"],
                                   num_decoder_layers=d["n_dec"])
    # spec coverage: every torch parameter element lands in the patch
    n_patch = sum(int(np.asarray(x).size)
                  for x in jax.tree_util.tree_leaves(patch))
    assert n_patch == _count_params(full)
    new_vars = {"params": merge_params(dict(variables["params"]), patch)}
    enc_j, dec_j, p_ctc, p_seq = model.apply(new_vars, feats_j, toks_j, lens)

    np.testing.assert_allclose(np.asarray(enc_j), enc_t.numpy(), atol=1e-4)
    # decoder rows at pad positions are garbage in both; compare valid rows
    valid = (tokens != 0).numpy()
    np.testing.assert_allclose(
        np.asarray(dec_j)[valid], dec_t.numpy()[valid], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_seq)[valid], seq_t.numpy()[valid], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(p_ctc), ctc_t.numpy(), atol=1e-4)


def test_lm_port_forward_parity():
    from speech_anonymization_tpu.models.transformer import TransformerLM
    from speech_anonymization_tpu.utils.reference_ckpts import (
        port_sb_lm_state_dict,
    )
    from speech_anonymization_tpu.utils.port_weights import merge_params

    torch.manual_seed(1)
    d = DIMS
    lm_t = SBTransformerLM(d["vocab"], d["d_model"], d["nhead"], 3, d["d_ffn"])
    lm_t.eval()
    sd = lm_t.state_dict()
    tokens = torch.tensor([[1, 5, 6, 9, 3], [1, 7, 3, 2, 0]])
    with torch.no_grad():
        out_t = lm_t(tokens)

    lm = TransformerLM(vocab=d["vocab"], d_model=d["d_model"], nhead=d["nhead"],
                       num_layers=3, d_ffn=d["d_ffn"], sb_compat=True)
    toks_j = jnp.asarray(tokens.numpy())
    variables = lm.init(jax.random.PRNGKey(0), toks_j)
    patch = port_sb_lm_state_dict(sd, nhead=d["nhead"], num_layers=3)
    n_patch = sum(int(np.asarray(x).size)
                  for x in jax.tree_util.tree_leaves(patch))
    assert n_patch == _count_params(lm_t)
    new_vars = {"params": merge_params(dict(variables["params"]), patch)}
    out_j = lm.apply(new_vars, toks_j)
    valid = (tokens != 0).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j)[valid], out_t.numpy()[valid], atol=1e-4
    )


def test_sb_compat_cached_decode_matches_full():
    """sb_compat mode (final norms, SB head) must keep cached==full decode
    parity — the ported weights will be served through the cached path."""
    from speech_anonymization_tpu.models.asr import ASRModel
    from speech_anonymization_tpu.models.transformer import make_kv_cache

    d = DIMS
    model = ASRModel(
        d_model=d["d_model"], nhead=d["nhead"], num_encoder_layers=1,
        num_decoder_layers=2, d_ffn=d["d_ffn"], output_neurons=24,
        sb_compat=True,
    )
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, 24, 80))
    tokens = jnp.asarray([[1, 5, 6, 9, 2, 0], [1, 7, 3, 4, 8, 2]], jnp.int32)
    lens = jnp.asarray([1.0, 0.75])
    variables = model.init(key, feats, tokens[:, :3], lens)
    enc = model.apply(variables, feats, lens, method=ASRModel.encode)
    cache = make_kv_cache(2, 6, 2, d["nhead"], d["d_model"] // d["nhead"])
    for step in range(4):
        full = model.apply(
            variables, tokens, enc, lens, step, method=ASRModel.decode_one_step
        )
        cached, cache = model.apply(
            variables, tokens[:, step], enc, cache, step, lens,
            method=ASRModel.decode_step_cached,
        )
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(full), atol=2e-4
        )

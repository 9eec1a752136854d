"""Proof / SRS (de)serialization and SRS disk caching.

The reference derives CanonicalSerialize only for proofs (gipa.rs:24,
tipa/mod.rs:41, structured_scalar_message.rs:138) and leaves SRS and
AggregateProof unserializable; SURVEY.md section 5.4 calls for serializing
everything, plus caching SRS to disk keyed by (curve, size, seed) since
generation at 2^16+ is expensive.

Element formats are the arkworks-compatible ones in serialize.py
(uncompressed); containers use u64-LE length prefixes."""

from __future__ import annotations

import os
from typing import Any, List, Tuple

from ..models import gipa, ssm, tipa
from ..models.algebra import IdentityOutput
from .serialize import CurveSerializer


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def take(self, n: int) -> bytes:
        out = self.data[self.off:self.off + n]
        assert len(out) == n, "truncated stream"
        self.off += n
        return out

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "little")

    def done(self) -> bool:
        return self.off == len(self.data)


# --- kind-dispatched elements ----------------------------------------------

def ser_elem(s: CurveSerializer, kind: str, v) -> bytes:
    if kind == "fr":
        return s.fr(v)
    if kind == "g1":
        return s.g1(v)
    if kind == "g2":
        return s.g2(v)
    if kind == "gt":
        return s.gt(v)
    raise ValueError(kind)


def deser_elem(s: CurveSerializer, kind: str, rd: Reader):
    if kind == "fr":
        return s.deser_fr(rd.take(s.fr_size()))
    if kind == "g1":
        return s.deser_g1(rd.take(s.g1_size()))
    if kind == "g2":
        return s.deser_g2(rd.take(s.g2_size()))
    if kind == "gt":
        return s.deser_gt(rd.take(s.gt_size()))
    raise ValueError(kind)


def _com_kinds(cfg) -> Tuple[str, str, str]:
    """(lmc, rmc, ipc-inner) output kinds for one GIPA config."""
    return (
        cfg.lmc.out_alg.kind,
        getattr(cfg.rmc.out_alg, "kind", "fr"),
        cfg.ipc.out_alg.inner.kind,
    )


def _ser_com(s, kinds, com) -> bytes:
    a, b, t = com
    out = ser_elem(s, kinds[0], a)
    out += ser_elem(s, kinds[1], b if not isinstance(b, IdentityOutput)
                    else b.items[0])
    assert isinstance(t, IdentityOutput) and len(t.items) == 1
    out += ser_elem(s, kinds[2], t.items[0])
    return out


def _deser_com(s, kinds, rd: Reader, ipc_kind: str):
    a = deser_elem(s, kinds[0], rd)
    b = deser_elem(s, kinds[1], rd)
    t = IdentityOutput([deser_elem(s, kinds[2], rd)], ipc_kind)
    return (a, b, t)


# --- GIPA --------------------------------------------------------------------

def ser_gipa_proof(cfg, proof: gipa.GIPAProof) -> bytes:
    s = CurveSerializer(cfg.ctx.host)
    kinds = _com_kinds(cfg)
    out = len(proof.steps).to_bytes(8, "little")
    for com_1, com_2 in proof.steps:
        out += _ser_com(s, kinds, com_1) + _ser_com(s, kinds, com_2)
    a, b = proof.r_base
    out += ser_elem(s, cfg.lmc.msg_kind, a)
    out += ser_elem(s, cfg.rmc.msg_kind, b)
    return out


def deser_gipa_proof(cfg, data: bytes) -> gipa.GIPAProof:
    proof, rd = _deser_gipa_proof(cfg, Reader(data))
    assert rd.done(), "trailing bytes"
    return proof


def _deser_gipa_proof(cfg, rd: Reader) -> Tuple[gipa.GIPAProof, Reader]:
    s = CurveSerializer(cfg.ctx.host)
    kinds = _com_kinds(cfg)
    ipc_kind = cfg.ipc.out_alg.inner.kind
    n = rd.u64()
    steps = []
    for _ in range(n):
        com_1 = _deser_com(s, kinds, rd, ipc_kind)
        com_2 = _deser_com(s, kinds, rd, ipc_kind)
        steps.append((com_1, com_2))
    a = deser_elem(s, cfg.lmc.msg_kind, rd)
    b = deser_elem(s, cfg.rmc.msg_kind, rd)
    return gipa.GIPAProof(steps=steps, r_base=(a, b)), rd


# --- TIPA / SSM ---------------------------------------------------------------

def ser_tipa_proof(cfg, proof: tipa.TIPAProof) -> bytes:
    s = CurveSerializer(cfg.ctx.host)
    out = ser_gipa_proof(cfg, proof.gipa_proof)
    out += s.g2(proof.final_ck[0]) + s.g1(proof.final_ck[1])
    out += s.g2(proof.final_ck_proof[0]) + s.g1(proof.final_ck_proof[1])
    return out


def deser_tipa_proof(cfg, data: bytes) -> tipa.TIPAProof:
    s = CurveSerializer(cfg.ctx.host)
    rd = Reader(data)
    gproof, rd = _deser_gipa_proof(cfg, rd)
    ck_a = s.deser_g2(rd.take(s.g2_size()))
    ck_b = s.deser_g1(rd.take(s.g1_size()))
    op_a = s.deser_g2(rd.take(s.g2_size()))
    op_b = s.deser_g1(rd.take(s.g1_size()))
    assert rd.done(), "trailing bytes"
    return tipa.TIPAProof(gipa_proof=gproof, final_ck=(ck_a, ck_b),
                          final_ck_proof=(op_a, op_b))


def ser_tipa_ssm_proof(cfg, proof: ssm.TIPAWithSSMProof) -> bytes:
    s = CurveSerializer(cfg.ctx.host)
    out = ser_gipa_proof(cfg, proof.gipa_proof)
    out += s.g2(proof.final_ck) + s.g2(proof.final_ck_proof)
    return out


def deser_tipa_ssm_proof(cfg, data: bytes) -> ssm.TIPAWithSSMProof:
    s = CurveSerializer(cfg.ctx.host)
    rd = Reader(data)
    gproof, rd = _deser_gipa_proof(cfg, rd)
    final_ck = s.deser_g2(rd.take(s.g2_size()))
    opening = s.deser_g2(rd.take(s.g2_size()))
    assert rd.done(), "trailing bytes"
    return ssm.TIPAWithSSMProof(gipa_proof=gproof, final_ck=final_ck,
                                final_ck_proof=opening)


# --- Groth16 aggregation -------------------------------------------------------

def ser_aggregate_proof(ctx, proof) -> bytes:
    from ..applications.groth16_aggregation import AggregateProof
    from ..models.instances import mipp_ssm_config, tipp_config

    assert isinstance(proof, AggregateProof)
    s = CurveSerializer(ctx.host)
    out = s.gt(proof.com_a) + s.gt(proof.com_b) + s.gt(proof.com_c)
    out += s.gt(proof.ip_ab) + s.g1(proof.agg_c)
    out += ser_tipa_proof(tipp_config(ctx), proof.tipa_proof_ab)
    out += ser_tipa_ssm_proof(mipp_ssm_config(ctx), proof.tipa_proof_c)
    return out


def deser_aggregate_proof(ctx, data: bytes):
    from ..applications.groth16_aggregation import AggregateProof
    from ..models.instances import mipp_ssm_config, tipp_config

    s = CurveSerializer(ctx.host)
    rd = Reader(data)
    com_a = s.deser_gt(rd.take(s.gt_size()))
    com_b = s.deser_gt(rd.take(s.gt_size()))
    com_c = s.deser_gt(rd.take(s.gt_size()))
    ip_ab = s.deser_gt(rd.take(s.gt_size()))
    agg_c = s.deser_g1(rd.take(s.g1_size()))
    # split: TIPA proof length is self-describing via its step count, so
    # reuse the incremental readers
    cfg_ab = tipp_config(ctx)
    gab, rd = _deser_gipa_proof(cfg_ab, rd)
    ck_a = s.deser_g2(rd.take(s.g2_size()))
    ck_b = s.deser_g1(rd.take(s.g1_size()))
    op_a = s.deser_g2(rd.take(s.g2_size()))
    op_b = s.deser_g1(rd.take(s.g1_size()))
    proof_ab = tipa.TIPAProof(gipa_proof=gab, final_ck=(ck_a, ck_b),
                              final_ck_proof=(op_a, op_b))
    cfg_c = mipp_ssm_config(ctx)
    gc, rd = _deser_gipa_proof(cfg_c, rd)
    final_ck = s.deser_g2(rd.take(s.g2_size()))
    opening = s.deser_g2(rd.take(s.g2_size()))
    assert rd.done(), "trailing bytes"
    proof_c = ssm.TIPAWithSSMProof(gipa_proof=gc, final_ck=final_ck,
                                   final_ck_proof=opening)
    return AggregateProof(com_a=com_a, com_b=com_b, com_c=com_c, ip_ab=ip_ab,
                          agg_c=agg_c, tipa_proof_ab=proof_ab,
                          tipa_proof_c=proof_c)


# --- SRS -----------------------------------------------------------------------

def ser_srs(srs: tipa.SRS) -> bytes:
    ctx = srs.ctx
    s = CurveSerializer(ctx.host)
    g_pows = srs.g_alpha_powers.to_host()
    h_pows = srs.h_beta_powers.to_host()
    out = s.g1_vec(g_pows) + s.g2_vec(h_pows)
    out += s.g1(srs.g_beta) + s.g2(srs.h_alpha)
    return out


def deser_srs(ctx, data: bytes) -> tipa.SRS:
    from ..models.vectors import PointVec

    s = CurveSerializer(ctx.host)
    rd = Reader(data)
    n1 = rd.u64()
    g_pows = [s.deser_g1(rd.take(s.g1_size())) for _ in range(n1)]
    n2 = rd.u64()
    h_pows = [s.deser_g2(rd.take(s.g2_size())) for _ in range(n2)]
    g_beta = s.deser_g1(rd.take(s.g1_size()))
    h_alpha = s.deser_g2(rd.take(s.g2_size()))
    assert rd.done(), "trailing bytes"
    return tipa.SRS(
        ctx=ctx,
        g_alpha_powers=PointVec.from_host(ctx, "g1", g_pows),
        h_beta_powers=PointVec.from_host(ctx, "g2", h_pows),
        g_beta=g_beta,
        h_alpha=h_alpha,
    )


def srs_cache_path(cache_dir: str, curve_name: str, size: int,
                   seed: int) -> str:
    return os.path.join(cache_dir, f"srs_{curve_name}_{size}_{seed}.bin")


def setup_srs_cached(ctx, size: int, seed: int,
                     cache_dir: str = ".srs_cache") -> tipa.SRS:
    """TIPA SRS with disk caching keyed by (curve, size, seed)."""
    from .fiat_shamir import SeededRng

    path = srs_cache_path(cache_dir, ctx.host.name, size, seed)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return deser_srs(ctx, f.read())
    srs = tipa.setup_srs(ctx, SeededRng(seed), size)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(ser_srs(srs))
    os.replace(tmp, path)
    return srs

"""DMR rate-3/4 trellis code (ETSI TS 102 361-1 B.2.2) for data bursts.

Equivalent of reference src/MMDVM/DMRTrellis.cpp (374 LoC): 144 payload
bits -> 48 tribits (+ a terminating zero tribit) -> 49 constellation
points from an 8-state trellis (state = previous tribit) -> 98 dibits
-> interleaved into the burst's 196 info-bit positions.

TPU-native formulation: the reference decodes by running the encoder
state machine until it hits an impossible transition, then greedily
retries 16 candidate points at the failure position ("fixCode", up to
20 repair hops). Here decode is a true batched Viterbi over the 8-state
trellis — 49 steps x 64 transitions, vectorized over any number of
frames — which both corrects strictly more error patterns and has a
fixed, branch-free schedule. Constellation distance between the
received and hypothesized points is the summed dibit level distance.

All tables below (dibit interleave, trellis transition table, the
point <-> dibit-pair constellation) are air-interface constants of the
ETSI standard, matching DMRTrellis.cpp:31-47.
"""

from __future__ import annotations

import numpy as np

# on-air dibit i lives at interleaved tribit-lattice position TABLE[i]
# (DMRTrellis.cpp:31-36)
INTERLEAVE_TABLE = np.array([
    0, 1, 8, 9, 16, 17, 24, 25, 32, 33, 40, 41, 48, 49, 56, 57, 64, 65,
    72, 73, 80, 81, 88, 89, 96, 97,
    2, 3, 10, 11, 18, 19, 26, 27, 34, 35, 42, 43, 50, 51, 58, 59, 66, 67,
    74, 75, 82, 83, 90, 91,
    4, 5, 12, 13, 20, 21, 28, 29, 36, 37, 44, 45, 52, 53, 60, 61, 68, 69,
    76, 77, 84, 85, 92, 93,
    6, 7, 14, 15, 22, 23, 30, 31, 38, 39, 46, 47, 54, 55, 62, 63, 70, 71,
    78, 79, 86, 87, 94, 95], np.int64)

# trellis transition table: point = ENCODE[state, tribit]
# (DMRTrellis.cpp:38-46)
ENCODE_TABLE = np.array([
    [0,  8, 4, 12, 2, 10, 6, 14],
    [4, 12, 2, 10, 6, 14, 0,  8],
    [1,  9, 5, 13, 3, 11, 7, 15],
    [5, 13, 3, 11, 7, 15, 1,  9],
    [3, 11, 7, 15, 1,  9, 5, 13],
    [7, 15, 1,  9, 5, 13, 3, 11],
    [2, 10, 6, 14, 0,  8, 4, 12],
    [6, 14, 0,  8, 4, 12, 2, 10]], np.int64)

# constellation: point -> (dibit1, dibit2) signal levels
# (DMRTrellis.cpp dibitsToPoints)
POINT_DIBITS = np.array([
    (+1, -1), (-1, -1), (+3, -3), (-3, -3), (-3, -1), (+3, -1), (-1, -3),
    (+1, -3), (-3, +3), (+3, +3), (-1, +1), (+1, +1), (+1, +3), (-1, +3),
    (+3, +1), (-3, +1)], np.int64)

# bit pair (b1, b2) -> dibit level: (0,1)->+3 (0,0)->+1 (1,0)->-1 (1,1)->-3
_BITS_TO_LEVEL = np.array([+1, +3, -1, -3], np.int64)
_LEVEL_TO_BITS = {+1: (0, 0), +3: (0, 1), -1: (1, 0), -3: (1, 1)}

# (level1, level2) -> point index (levels offset to 0..3 by (l+3)//2)
_PAIR_TO_POINT = np.zeros((4, 4), np.int64)
for _p, (_l1, _l2) in enumerate(POINT_DIBITS):
    _PAIR_TO_POINT[(_l1 + 3) // 2, (_l2 + 3) // 2] = _p

# distance between points in dibit-level space, (16, 16)
_D1 = POINT_DIBITS[:, 0]
_D2 = POINT_DIBITS[:, 1]
POINT_DIST = (np.abs(_D1[:, None] - _D1[None, :])
              + np.abs(_D2[:, None] - _D2[None, :])) // 2

N_INFO = 196
N_PAYLOAD = 144
N_TRIBITS = 49


def _bits_to_tribits(bits):
    """(..., 144) -> (..., 49) tribit symbols (terminal zero appended).

    Tribit i packs payload bits from the tail forward: MSB = bit
    143-3i (DMRTrellis.cpp bitsToTribits).
    """
    bits = np.asarray(bits, np.int64)
    rev = bits[..., ::-1].reshape(*bits.shape[:-1], 48, 3)
    tri = rev[..., 0] * 4 + rev[..., 1] * 2 + rev[..., 2]
    return np.concatenate(
        [tri, np.zeros(bits.shape[:-1] + (1,), np.int64)], axis=-1)


def _tribits_to_bits(tri):
    """(..., 49) -> (..., 144) payload bits (inverse of the above)."""
    tri = np.asarray(tri, np.int64)[..., :48]
    b1 = (tri >> 2) & 1
    b2 = (tri >> 1) & 1
    b3 = tri & 1
    bits = np.stack([b1, b2, b3], axis=-1).reshape(*tri.shape[:-1], 144)
    return bits[..., ::-1].astype(np.uint8)


def encode(payload_bits) -> np.ndarray:
    """(..., 144) payload bits -> (..., 196) interleaved info bits."""
    tri = _bits_to_tribits(payload_bits)
    lead = tri.shape[:-1]
    # run the 8-state machine: point[i] = ENCODE[state, tribit],
    # state' = tribit; state starts at 0 so prev = [0, tri[:-1]]
    prev = np.concatenate(
        [np.zeros(lead + (1,), np.int64), tri[..., :-1]], axis=-1)
    points = ENCODE_TABLE[prev, tri]                       # (..., 49)
    levels = POINT_DIBITS[points]                           # (..., 49, 2)
    dibits = levels.reshape(*lead, 98)
    # interleave: on-air dibit i = dibits[INTERLEAVE_TABLE[i]]
    air = dibits[..., INTERLEAVE_TABLE]
    b1 = (air < 0).astype(np.uint8)
    b2 = (np.abs(air) == 3).astype(np.uint8)
    return np.stack([b1, b2], axis=-1).reshape(*lead, N_INFO)


def decode(info_bits):
    """(..., 196) received info bits -> ((..., 144) payload, (...,) ok).

    Batched 8-state Viterbi; ok means the best path re-encodes to the
    received points exactly (zero corrected errors, the analogue of the
    reference's checkCode pass at DMRTrellis.cpp:355-373).
    """
    info_bits = np.asarray(info_bits, np.int64)
    lead = info_bits.shape[:-1]
    pairs = info_bits.reshape(*lead, 98, 2)
    air = _BITS_TO_LEVEL[pairs[..., 0] * 2 + pairs[..., 1]]
    dibits = np.empty(lead + (98,), np.int64)
    dibits[..., INTERLEAVE_TABLE] = air
    lv = dibits.reshape(*lead, 49, 2)
    rx_points = _PAIR_TO_POINT[(lv[..., 0] + 3) // 2, (lv[..., 1] + 3) // 2]

    big = 1 << 20
    pm = np.full(lead + (8,), big, np.int64)
    pm[..., 0] = 0
    decisions = np.empty(lead + (N_TRIBITS, 8), np.int8)
    # branch metric for step t: bm[s, u] = dist(rx[t], ENCODE[s, u])
    dist_to = POINT_DIST[:, ENCODE_TABLE]    # (16 rx, 8 s, 8 u)
    for t in range(N_TRIBITS):
        bm = dist_to[rx_points[..., t]]      # (..., 8 s, 8 u)
        cand = pm[..., :, None] + bm
        pm = np.min(cand, axis=-2)           # (..., 8) over next state u
        decisions[..., t, :] = np.argmin(cand, axis=-2).astype(np.int8)
        pm -= pm.min(axis=-1, keepdims=True)
    # terminal tribit is 0
    tri = np.empty(lead + (N_TRIBITS,), np.int64)
    state = np.zeros(lead, np.int64)
    it = list(np.ndindex(*lead)) if lead else [()]
    for idx in it:
        st = 0
        for t in range(N_TRIBITS - 1, -1, -1):
            tri[idx + (t,)] = st
            st = int(decisions[idx + (t, st)])
        state[idx] = st
    payload = _tribits_to_bits(tri)
    ok = np.all(encode(payload) == (info_bits & 1), axis=-1)
    return payload, ok

"""qradiolink_tpu — a TPU-native SDR signal-processing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of QRadioLink
(reference: qradiolink/qradiolink, GNU Radio 3.10 + Qt). Instead of a
thread-per-block flowgraph, every modem chain is a pure function

    (state, iq_block[..., T]) -> (state', outputs)

compiled with jit/pjit. All carried quantities the reference keeps implicitly
inside GNU Radio block internals (FIR tails, resampler phase, rotator phase,
AGC gain, PLL/TED state, deframer shift registers) live explicitly in the
state pytree, which makes chains vmappable over channels and shardable over
device meshes.

Package layout:
  ops/      DSP primitives (filter design, FIR, resamplers, rotator, demod
            math, AGC, squelch, FFT probes)
  sync/     carrier/timing recovery loops (Costas, FLL, symbol sync)
  fec/      channel coding (scrambler, Viterbi, Golay, Hamming, BPTC, RS, CRC)
  chains/   per-mode RX/TX modem chains (NBFM, SSB, AM, WBFM, xFSK, xPSK, ...)
  models/   mode registry mapping reference mode identifiers to chains
  framing/  layer-1/layer-2 framing, M17 and DMR protocol stacks
  parallel/ mesh/sharding utilities: channel + time-block sharding with halos
  io/       IQ sources/sinks, WAV audio, UDP streaming
  audio/    audio processing (emphasis, compressor, mixer, codec bridges)
  utils/    config, logging, misc
"""

__version__ = "0.1.0"

from qradiolink_tpu.core import Block, Chain, run_stream  # noqa: F401

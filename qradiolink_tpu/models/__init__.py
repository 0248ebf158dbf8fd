"""Mode registry: maps the reference's operating modes to chains + framing."""

from qradiolink_tpu.models.registry import (  # noqa: F401
    MODES, ModeSpec, get_mode, rx_chain, tx_chain,
)

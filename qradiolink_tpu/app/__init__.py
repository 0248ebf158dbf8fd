"""Application layer: host orchestration (RadioController) and CLI."""

from qradiolink_tpu.app.controller import RadioController, RxEvent  # noqa: F401

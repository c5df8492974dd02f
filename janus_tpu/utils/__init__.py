"""Utilities: training checkpoints and misc helpers."""

from janus_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["save_checkpoint", "restore_checkpoint"]

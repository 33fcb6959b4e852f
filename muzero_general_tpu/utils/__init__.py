"""Shared utilities."""

from muzero_general_tpu.utils.seeding import seed_everything

__all__ = ["seed_everything"]

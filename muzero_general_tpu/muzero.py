"""Orchestrator: the `MuZero` user-facing class and CLI (stub, filled in below).

Parity target: reference muzero.py:24-479 (train/test/load_model/diagnose_model),
:495-581 (hyperparameter_search), :622-712 (CLI menu).
"""


class MuZero:  # placeholder — implemented after the training stack lands
    def __init__(self, game_name, config=None, split_resources_in=1):
        raise NotImplementedError("training stack under construction")


def hyperparameter_search(*args, **kwargs):
    raise NotImplementedError("training stack under construction")

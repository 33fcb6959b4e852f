"""Pure-function compute ops: support codecs, batched MCTS, targets, stacking."""

"""`python -m muzero_general_tpu [game] ['{json overrides}']` entry point.

CLI parity with `python muzero.py [game] [config]` (reference muzero.py:622-712).
"""

from muzero_general_tpu.muzero import main

if __name__ == "__main__":
    main()

"""``python -m tpufeat`` == ``python -m tpufeat.cli``."""
import sys

from tpufeat.cli import main

sys.exit(main())

"""`python -m inpe_queimadas_etl_spark` — see cli.py."""

import sys

from .cli import main

sys.exit(main())

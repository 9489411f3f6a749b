"""`python -m dablooms_spark <subcommand>` — see jobs.py."""

import sys

from dablooms_spark.jobs import main

sys.exit(main())

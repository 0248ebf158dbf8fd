import sys

from qradiolink_tpu.app.cli import main

sys.exit(main())

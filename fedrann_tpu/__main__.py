import sys

from fedrann_tpu.cli import main

sys.exit(main())

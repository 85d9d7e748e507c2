import sys

from maskrcnn_tpu.cli.main import main

sys.exit(main())

"""Make ivfadc_spark importable whether run via spark-submit --py-files
(engine zip on the path) or plain ``python jobs/<job>.py`` from the repo."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

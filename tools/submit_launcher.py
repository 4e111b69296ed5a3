"""spark-submit entry point: the driver file must be a plain script, so
it just dispatches into the packaged CLI (shipped via --py-files)."""

import sys

from webscraper_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

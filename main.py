"""spark-submit driver file: ``spark-submit --py-files alligator_spark.zip
main.py --input ... --workdir ...`` (thin shim over alligator_spark.cli)."""

import sys

from alligator_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

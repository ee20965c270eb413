from datax_spark.cli import main

raise SystemExit(main())

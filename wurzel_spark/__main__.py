from wurzel_spark.cli import main

raise SystemExit(main())

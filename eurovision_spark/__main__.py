from eurovision_spark.cli import main

raise SystemExit(main())

from transf_spark.cli import main

raise SystemExit(main())

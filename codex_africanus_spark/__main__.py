from codex_africanus_spark.cli import main

raise SystemExit(main())

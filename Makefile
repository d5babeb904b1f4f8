# grappolo_spark build targets

PY ?= python

.PHONY: test verify bench package scaling clean

test:
	$(PY) -m pytest tests/ -x -q

verify:
	$(PY) scripts/verify_queries.py /root/testdata/sf0.01

bench:
	$(PY) bench.py

scaling:
	$(PY) scripts/scaling_bench.py

# spark-submit --py-files dist/grappolo_spark.zip scripts/run_job.py ...
package:
	mkdir -p dist
	rm -f dist/grappolo_spark.zip
	cd . && zip -qr dist/grappolo_spark.zip grappolo_spark -x '*__pycache__*'
	@echo built dist/grappolo_spark.zip

clean:
	rm -rf dist .pytest_cache
	find . -name __pycache__ -prune -exec rm -rf {} +

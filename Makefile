.PHONY: test dist bench scaling loop plans oracles verify clean

test:
	python -m pytest tests/ -x -q

dist:
	rm -f dist/jirlbot_spark.zip
	mkdir -p dist
	cd . && zip -qr dist/jirlbot_spark.zip jirlbot_spark -i '*.py' '*.dat'
	@echo "submit with: spark-submit --py-files dist/jirlbot_spark.zip your_job.py"

bench:
	python bench.py

scaling:
	python bench.py --scaling

loop:
	python bench.py --loop

plans:
	python tools/plan_audit.py

oracles:
	python tools/check_oracles.py

verify: test oracles plans
	@echo 'verify: tests + oracle parity + plan audit all green'

clean:
	rm -rf dist .pytest_cache

#!/bin/bash
# Armed runner: the moment the axon tunnel answers, run the real-chip gate
# (tpu_smoke), then the full current-round sweep. If the smoke fails — exactly
# what it exists to catch (e.g. a SELL kernel failing Mosaic lowering on
# the real chip) — the sweep still runs but SKIPS the *-sell legs instead
# of burning hours of chip time on invalid A/B rows.
# Logs to /tmp/reconnect_*.log; exits after one full pass.
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" > /tmp/reconnect_probe.log 2>&1; then
    if grep -q "TPU" /tmp/reconnect_probe.log; then
      echo "TUNNEL UP $(date)" >> /tmp/reconnect_main.log
      break
    fi
  fi
  sleep 90
done
timeout 3000 python tools/tpu_smoke.py > /tmp/reconnect_smoke.log 2>&1
smoke_rc=$?
echo "smoke rc=$smoke_rc $(date)" >> /tmp/reconnect_main.log
extra=""
if [ $smoke_rc -ne 0 ]; then
  if grep -q '"check": "sell[^"]*", "ok": false' /tmp/reconnect_smoke.log; then
    extra="--no-sell"
    echo "sell checks failed -> sweeping with --no-sell" >> /tmp/reconnect_main.log
  else
    echo "non-sell smoke failure -> NOT sweeping; inspect /tmp/reconnect_smoke.log" >> /tmp/reconnect_main.log
    exit 1
  fi
fi
timeout 36000 python tools/run_sweep.py --tile-study $extra --out /root/repo/SWEEP_R5.jsonl > /tmp/reconnect_sweep.log 2>&1
echo "sweep rc=$? $(date)" >> /tmp/reconnect_main.log

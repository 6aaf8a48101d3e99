#!/bin/bash
# Poll the TPU tunnel until it answers, then fire the round-3 measurement
# batch (tools/round3_tpu_session.sh). Each probe is bounded; the tunnel
# recovers on its own after wedging, so this just waits it out.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TUNNEL UP at attempt $i ($(date))"
    bash tools/round3_tpu_session.sh 2>&1
    echo "BATCH DONE ($(date))"
    exit 0
  fi
  echo "probe $i failed ($(date)); sleeping 180s"
  sleep 180
done
echo "GAVE UP"
exit 1

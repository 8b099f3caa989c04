from music_tpu.cli import main

main()
